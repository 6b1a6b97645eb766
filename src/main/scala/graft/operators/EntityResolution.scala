package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage / entity resolution: collapse name VARIANTS
  * ("Dr. Jane Doe" / "jane doe" / a typo'd form) of the same real-world
  * entity to one canonical id — the author-disambiguation layer a
  * scholarly pipeline runs before any per-author statistic (h-index,
  * co-authorship edges) means anything (reference: the author-string
  * normalize+join family, data_processor.py; the entity itself is never
  * resolved there — every variant counts separately, which is exactly
  * the miscount this operator removes).
  *
  * Classic blocked-linkage shape, kept fully relational:
  *
  *  1. NORMALIZE: case-fold + strip non-alphanumerics (the F1-F5
  *     normalize discipline applied to names). Null/empty-norm records
  *     never enter a block: they resolve as themselves (the valid-key
  *     exemption the dedup family applies before its shuffles — also
  *     removes the null hot key).
  *  2. BLOCK: records pair ONLY within a caller-chosen block key — the
  *     standard way record linkage avoids the corpus-wide O(N²) name
  *     cross product. The shuffle key is the block key, and a
  *     `maxBlock` guard drops OVERSIZED blocks from pairing
  *     deterministically (count-based, so the DuckDB oracle reproduces
  *     the decision): an undiscriminative key ("smith") would otherwise
  *     reintroduce the quadratic this operator exists to avoid. Dropped
  *     blocks degrade to no-match (records survive as themselves) — the
  *     same honest-refusal posture as `Cooccur`'s hub cap, and at 100 TB
  *     the block histogram, not the pair join, is what the guard keeps
  *     bounded.
  *  3. MATCH: within-block `id_a < id_b` pairs gated by an INTEGER-exact
  *     edit-distance ratio: levenshtein(a, b) * den <= max(len) * num —
  *     cross-multiplied longs, no float division, so the decision is
  *     bit-identical in any engine and the whole operator stays under
  *     the hash oracle.
  *  4. CLUSTER: matched pairs → `Dedup.connectedComponentsStar`
  *     (O(log²)-round large/small-star contraction) → every record
  *     labeled with its component; entity id = min record id of the
  *     component (the priority-dedup survivor convention).
  *
  * Per-pair cost is one levenshtein on short normalized strings;
  * per-record state is one (id, norm, block) row — nothing is collected
  * to the driver.
  */
object EntityResolution {

  /** The name-normalization used for matching: case-fold, strip every
    * non-alphanumeric (titles' dots, hyphens, spaces). */
  def normalizeName(name: Column): Column =
    regexp_replace(lower(name), "[^a-z0-9]", "")

  /** Within-block candidate pairs passing the integer-exact similarity
    * gate. Input frame must carry (id, norm, blk); output (id_a, id_b).
    * Blocks larger than `maxBlock` are excluded from pairing. */
  private def matchedPairs(recs: DataFrame, maxDistNum: Int,
                           maxDistDen: Int, maxBlock: Int): DataFrame = {
    // block histogram is #distinct-blocks-sized (small relative to the
    // corpus); the join back re-keys on blk, which the pair join below
    // reuses — one partitioning shared by guard and match
    val sized = recs.join(
      recs.groupBy("blk").agg(count(lit(1)).as("blk_n")), Seq("blk"))
      .where(col("blk_n") <= maxBlock)
    val a = sized.select(col("blk"), col("id").as("id_a"),
      col("norm").as("norm_a")).as("era")
    val b = sized.select(col("blk"), col("id").as("id_b"),
      col("norm").as("norm_b")).as("erb")
    a.join(b, col("era.blk") === col("erb.blk")
        && col("id_a") < col("id_b"))
      .where(levenshtein(col("norm_a"), col("norm_b")) * lit(maxDistDen)
        <= greatest(length(col("norm_a")), length(col("norm_b")))
          * lit(maxDistNum))
      .select(col("id_a"), col("id_b"))
  }

  /** Resolve records to entities. `block` is an expression over the
    * NORMALIZED name (exposed to it as `normalizeName(name)`); records
    * whose normalized name is null/empty resolve as themselves.
    * Output: (id, entity_id) — entity_id = min id of the matched
    * cluster, one row per input record. */
  def resolveEntities(records: DataFrame, id: Column, name: Column,
                      block: Column => Column,
                      maxDistNum: Int = 1, maxDistDen: Int = 8,
                      maxBlock: Int = 1000): DataFrame = {
    require(maxDistNum >= 0 && maxDistDen > 0,
      s"resolveEntities: ratio $maxDistNum/$maxDistDen must be a " +
        "non-negative fraction")
    require(maxBlock >= 2,
      s"resolveEntities: maxBlock=$maxBlock cannot form any pair")
    val norm = normalizeName(name)
    val base = records.select(id.as("id"), norm.as("norm"),
      block(norm).as("blk"))
    val linkable = base.where(col("norm").isNotNull &&
      length(col("norm")) > 0 && col("blk").isNotNull)
    val pairs =
      matchedPairs(linkable, maxDistNum, maxDistDen, maxBlock)
    val comp = Dedup.connectedComponentsStar(pairs)
    base.select(col("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("entity_id"))
  }
}
