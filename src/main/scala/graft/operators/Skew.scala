package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns (SURVEY.md §4.2 design rule). AQE handles
  * skewed JOINs automatically; skewed low-cardinality AGGREGATIONS are
  * mitigated by salting: pre-aggregate on (key, salt) so every reducer
  * sees at most |keys| × buckets groups of bounded size, then finalize
  * on (key). Exact for algebraic aggregates (sum/count/min/max — the
  * partial results merge losslessly).
  *
  * The salt must be DETERMINISTIC (derived by hashing a row column, not
  * rand()) or speculative re-execution of a lost partition could double-
  * count rows routed differently on retry.
  */
object Skew {

  /** Two-phase salted sum/count over a (possibly) hot grouping key.
    * `saltSource` should be a high-cardinality column (an id). Output
    * schema: key, n, sum — identical to the unsalted groupBy. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltSource: Column, buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(buckets.toLong)))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(value).as("psum"))
      .groupBy("key")
      .agg(sum(col("pn")).as("n"), sum(col("psum")).as("sum"))
  }
}
