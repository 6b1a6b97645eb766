package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SketchAggregates

/** Exact heavy hitters by sketch-then-verify — the two-pass shape that
  * finds every item above a frequency share WITHOUT a full-cardinality
  * groupBy shuffle:
  *
  *  1. SKETCH pass: one Misra-Gries aggregate (partial per partition,
  *     counter-wise merge) yields <= k candidates and the exact non-null
  *     total N. Completeness is guaranteed, not heuristic: any item with
  *     true count > N/(k+1) survives every merge order, so with
  *     k + 1 > 1/minShare the candidate set provably contains all items
  *     at or above ceil(minShare * N) (enforced below). The driver holds
  *     <= k candidate strings — a bounded collect of the same class as
  *     the IVF coarse sample.
  *  2. VERIFY pass: exact counts for the candidate set only (an InSet
  *     filter pushed into the scan column — the per-key state is k, not
  *     vocabulary-sized), then the exact threshold cut.
  *
  * The output is therefore fully DETERMINISTIC (exact counts, exact
  * threshold) even though the sketch's borderline content is merge-order
  * dependent — which is what lets the operator sit under the hash oracle
  * while the raw sketch cannot. At 100 TB the win is pass 2's aggregate
  * state: k counters per partition instead of a shuffle keyed on every
  * distinct item (a vocabulary that can be billions of n-grams).
  *
  * Output: item, n_item, n_total, threshold — ordered for presentation
  * by the caller.
  */
object HeavyHitters {

  def exactHeavyHitters(df: DataFrame, item: Column, minShare: Double,
                        k: Int = 1000): DataFrame = {
    require(minShare > 0 && minShare <= 1,
      s"exactHeavyHitters: minShare=$minShare must be in (0, 1]")
    require(k + 1 > 1.0 / minShare,
      s"exactHeavyHitters: k=$k too small for minShare=$minShare — the " +
        s"Misra-Gries completeness guarantee needs k + 1 > 1/minShare " +
        s"(= ${1.0 / minShare}); raise k or the share")
    // MisraGriesAgg consumes UTF8String internally with no input
    // coercion — a numeric item column would ClassCastException deep in
    // the aggregate; cast here so ANY item type works (the
    // Kmv.sourceSignatures convention), and use the SAME cast image for
    // the verify pass's isin keys below
    val it = item.cast("string").as("item")
    val row = df.agg(
      count(item).as("n"),
      SketchAggregates.misraGries(item.cast("string"), k).as("sketch"))
      .head()
    val n = row.getLong(0)
    val candidates: Seq[String] =
      row.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
    val threshold = math.ceil(minShare * n).toLong
    df.select(it)
      .where(col("item").isin(candidates: _*))
      .groupBy("item")
      .agg(count(lit(1)).as("n_item"))
      .where(col("n_item") >= threshold)
      .withColumn("n_total", lit(n))
      .withColumn("threshold", lit(threshold))
  }
}
