package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns (SURVEY.md §4.2 design rule). Skewed
  * low-cardinality AGGREGATIONS are mitigated by two-phase salting
  * (`saltedSumCount`); skewed shuffle JOINS by fact-side salting with a
  * replicated dim (`saltedJoin`). AQE's skew-join
  * (spark.sql.adaptive.skewJoin.enabled) splits oversized partitions at
  * runtime and is the first line of defense — salting is the static
  * path for keys hot beyond what AQE subdivides (AQE splits a skewed
  * partition into chunks of the SAME key joined against a replicated
  * build side, which salting reproduces without needing runtime stats),
  * or when the operator must behave identically with AQE off.
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
    require(!df.columns.contains("__salt"),
      "saltedSumCount: input already has a '__salt' column — rename it " +
        "upstream; the operator adds its own")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(buckets.toLong)))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(value).as("psum"))
      .groupBy("key")
      .agg(sum(col("pn")).as("n"), sum(col("psum")).as("sum"))
  }

  /** Salted shuffle join: a skewed FACT side against a dim that is too
    * big to broadcast. The fact side gets a deterministic salt in
    * [0, buckets); the dim side is replicated ×buckets (one row per
    * salt value); the join keys on (keys…, salt) — so a key hot enough
    * to swamp one reducer spreads over `buckets` reducers, at the price
    * of scanning the dim `buckets` times' worth of shuffle rows (cheap
    * by assumption: the dim is the small side).
    *
    * Exact for fact-preserving join types only (inner / left_outer):
    * every matching (fact, dim) pair meets exactly once because the fact
    * row's salt selects exactly one dim replica. Right/full outer are
    * rejected — an unmatched dim row would surface once per replica.
    *
    * Broadcastable dims don't need this (a broadcast join has no
    * shuffle to skew); it exists for the middle regime where the dim
    * exceeds the broadcast threshold and one fact key dominates. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltSource: Column, buckets: Int = 32,
                 joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer")
        .contains(joinType.toLowerCase),
      "saltedJoin preserves the FACT side only: right/full outer would " +
        "emit each unmatched dim row once per salt replica")
    require(buckets > 0, "buckets must be positive")
    // the AsOfJoin/IntervalJoin clash discipline: a pre-existing __salt
    // would be silently overwritten then dropped, and overlapping
    // non-key fact/dim columns would emit ambiguous duplicates that
    // fail on first downstream reference
    Seq(fact -> "fact", dim -> "dim").foreach { case (side, name) =>
      require(!side.columns.contains("__salt"),
        s"saltedJoin: $name already has a '__salt' column — rename it " +
          "upstream; the operator adds its own") }
    val overlap = fact.columns.toSeq.intersect(dim.columns.toSeq)
      .diff(keys)
    require(overlap.isEmpty,
      s"saltedJoin: non-key columns ${overlap.mkString(", ")} exist on " +
        "both sides — rename or prefix the dim columns first")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(buckets.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
