package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scholar-profile citation indices — the aggregate layer a bibliometrics
  * pipeline runs after metrics enrichment (the reference's domain: its X1
  * stage fetches per-journal citation metrics; these indices are the
  * standard per-entity rollups computed from exactly such per-paper
  * citation counts: Hirsch 2005 h-index, Egghe 2006 g-index, the i10
  * count, and totals).
  *
  * All-integer window math — no floats anywhere, so the DuckDB oracle is
  * trivially bit-exact:
  *  - h-index: papers ranked per group by (cites desc, id asc); h = the
  *    largest rank r with cites_r >= r.
  *  - g-index: g = the largest rank r whose cumulative cites >= r²
  *    (capped at n_papers by construction, the conventional variant).
  *  - i10: papers with >= 10 citations.
  *
  * Scale shape: ONE exchange on the group key feeds a single WindowExec
  * (row_number + running sum share the same frame sort), and the final
  * groupBy reuses that partitioning, so no second exchange. Per-group
  * state never materializes beyond the window buffer — groups are
  * author/venue-sized (thousands of papers), not corpus-sized; a
  * pathological mega-group degrades to one fat window partition, which is
  * the same bound any per-entity ranking has.
  */
object Biblio {

  /** Per-group citation indices. Output: `grp` (the group key — the
    * caller's alias on `group` is NOT propagated; rename on the result
    * if another name is needed), n_papers, n_cites, h_index, g_index,
    * i10. */
  def scholarIndices(papers: DataFrame, group: Column, id: Column,
                     cites: Column): DataFrame = {
    val base = papers.select(group.as("grp"), id.as("id"),
      cites.cast("long").as("cites"))
    val w = Window.partitionBy("grp").orderBy(col("cites").desc,
      col("id").asc)
    val ranked = base
      .withColumn("r", row_number().over(w))
      .withColumn("cum", sum(col("cites")).over(w))
    ranked.groupBy("grp")
      .agg(count(lit(1)).as("n_papers"),
        sum(col("cites")).as("n_cites"),
        coalesce(max(when(col("cites") >= col("r"), col("r"))), lit(0L))
          .cast("long").as("h_index"),
        // r² in LONG space: row_number is 32-bit and groups past 46341
        // rows would overflow the int square
        coalesce(max(when(col("cum") >=
            col("r").cast("long") * col("r").cast("long"), col("r"))),
          lit(0L)).cast("long").as("g_index"),
        sum(when(col("cites") >= 10, 1L).otherwise(0L)).as("i10"))
  }
}
