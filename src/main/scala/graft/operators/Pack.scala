package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining (BASELINE.json extension): the
  * concat-and-chunk layout. Documents are concatenated in a
  * deterministic pseudo-random order and cut into fixed `budget`-token
  * training sequences; a document may straddle a cut (standard
  * pretraining packing — the chunker owns sequence boundaries, not the
  * document). Each document gets its position: which sequence its first
  * token lands in and at what offset.
  *
  * Scale: one GLOBAL concatenation order would funnel the running sum
  * through a single window partition. Instead ids hash into `buckets`
  * independent packing streams and each stream is packed by its own
  * running-sum window — one shuffle keyed on (uniform) bucket, every
  * partition O(corpus/buckets). Sequence ids are (bucket, seq) pairs:
  * globally unique with zero coordination. The final sequence of each
  * bucket may be short — downstream pads or drops it, exactly like the
  * tail batch of any chunker.
  *
  * Determinism: order and bucket derive from hashes of the id (no RNG
  * state, no partition-layout dependence — the
  * monotonically_increasing_id trap), so any engine reproduces the same
  * layout. Defaults use xxhash64; pass `bucketExpr`/`orderExpr` to use
  * an engine-portable hash (the oracle query uses md5, which DuckDB
  * shares bit-for-bit).
  */
object Pack {

  /** Assign (bucket, seq, offset) to every document.
    *
    * @param tokens per-document token count (never null; coalesce
    *               upstream — a null would poison the running sum)
    * @param budget tokens per training sequence
    * @param bucketExpr override the bucket hash (default
    *                   `pmod(xxhash64(id), buckets)`)
    * @param orderExpr override the in-bucket concatenation order
    *                  (default `xxhash64(id, 42)`; ties broken by id)
    */
  def concatChunk(docs: DataFrame, id: Column, tokens: Column,
                  budget: Long, buckets: Int = 1024,
                  bucketExpr: Option[Column] = None,
                  orderExpr: Option[Column] = None): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(buckets > 0, "buckets must be positive")
    val base = docs.select(id.as("doc_id"),
      tokens.cast("long").as("n_tokens"),
      bucketExpr.getOrElse(pmod(xxhash64(id), lit(buckets.toLong)))
        .cast("long").as("bucket"),
      orderExpr.getOrElse(xxhash64(id, lit(42))).as("__ord"))
    // explicit ROWS frame: the default RANGE frame makes rows tying on
    // (__ord, doc_id) — duplicate doc ids — frame PEERS, so both would
    // read the same cum_before and overlap at one (seq, offset) while a
    // budget-sized hole goes unassigned
    val w = Window.partitionBy("bucket")
      .orderBy(col("__ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) - col("n_tokens"))
      // integer div/mod on longs: exact at any corpus size (a double
      // floor would lose bits past 2^53 cumulative tokens — ~100 TB is
      // exactly where that stops being hypothetical)
      .select(col("doc_id"), col("bucket"), col("n_tokens"),
        expr(s"cum_before DIV ${budget}L").as("seq"),
        (col("cum_before") % budget).as("offset"))
  }
}
