package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Skew}

class AsOfSkewSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOf: latest right at-or-before left; ties match; no-prior -> null") {
    val clicks = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),   // before any purchase -> null
      (2L, 7L, ts("2024-01-01 12:00:00")),   // tie: purchase at exactly 12:00
      (3L, 7L, ts("2024-01-01 15:00:00")),   // after both purchases
      (4L, 9L, ts("2024-01-01 12:00:00"))    // other user, no purchases
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (7L, ts("2024-01-01 12:00:00"), 5.0),
      (7L, ts("2024-01-01 13:30:00"), 9.0)
    ).toDF("user_id", "pts", "pvalue")
    val out = AsOfJoin.asOf(clicks, purchases, "user_id", "ts", "pts",
        Seq("pts", "pvalue"))
      .orderBy("event_id")
      .select(col("event_id"), col("asof_pvalue"))
      .as[(Long, Option[Double])].collect()
    assert(out === Seq((1L, None), (2L, Some(5.0)), (3L, Some(9.0)),
      (4L, None)))
  }

  test("saltedSumCount equals plain groupBy on a skewed key") {
    val df = (1 to 2000).map(i => (if (i % 100 == 0) "rare" else "hot",
      i.toLong, i * 1.5)).toDF("k", "id", "v")
    val salted = Skew.saltedSumCount(df, col("k"), col("v"), col("id"),
        buckets = 8)
      .orderBy("key").as[(String, Long, Double)].collect()
    val plain = df.groupBy("k").agg(count(lit(1)), sum("v"))
      .orderBy("k").as[(String, Long, Double)].collect()
    assert(salted.map(t => (t._1, t._2)) === plain.map(t => (t._1, t._2)))
    // sums: double addition order differs between the two plans; compare
    // to exact tolerance
    salted.zip(plain).foreach { case (s, p) =>
      assert(math.abs(s._3 - p._3) < 1e-6)
    }
  }

  test("saltedJoin equals plain join and actually spreads the hot key") {
    // 1 hot key (900 rows) + 100 rare keys; dim of 101 keys
    val fact = (1 to 1000)
      .map(i => (if (i <= 900) 1L else (i % 100) + 2L, i.toLong))
      .toDF("k", "id")
    val dim = (1L to 102L).map(k => (k, s"name_$k")).toDF("k", "name")
    // force the shuffle-join regime saltedJoin exists for (a broadcast
    // join has no shuffle to skew)
    withNoBroadcast {
      val salted = Skew.saltedJoin(fact, dim, Seq("k"), col("id"),
        buckets = 8)
      val plain = fact.join(dim, Seq("k"))
      assert(salted.select("k", "id", "name").collect().toSet ===
        plain.select("k", "id", "name").collect().toSet)
      // the mechanism engages: physical join keys include the salt...
      val smj = salted.queryExecution.executedPlan.toString
      assert(smj.contains("__salt"), s"salt not in the join plan:\n$smj")
      // ...and the hot key's rows land in MORE distinct shuffle
      // partitions than the unsalted join's single reducer
      def hotSpread(df: org.apache.spark.sql.DataFrame): Long = df
        .where(col("k") === 1L)
        .select(org.apache.spark.sql.functions
          .spark_partition_id().as("p"))
        .distinct().count()
      assert(hotSpread(plain) === 1L)
      assert(hotSpread(Skew.saltedJoin(fact, dim, Seq("k"), col("id"),
        buckets = 8)) > 1L)
    }
    // dim-preserving join types are rejected (a replica per salt value
    // would surface each unmatched dim row `buckets` times)
    val ex = intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, Seq("k"), col("id"), joinType = "full")
    }
    assert(ex.getMessage.contains("FACT side"))
  }

  test("AQE skew-join engages on a hot key — the runtime defense " +
    "saltedJoin statically backs up (SURVEY §4.2)") {
    withConfs(Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.shuffle.partitions" -> "8")) {
      // half the fact rows pile onto key 1 with a fat payload — one
      // reducer's partition dwarfs the median and the 8KB threshold
      val fact = spark.range(1, 200001).select(
        when(col("id") % 2 === 0, 1L).otherwise(col("id")).as("k"),
        concat(lit("payload_payload_payload_"), col("id")).as("v"))
      val dim = spark.range(1, 1001).select(col("id").as("k"),
        concat(lit("n"), col("id")).as("name"))
      val j = fact.join(dim, "k")
      assert(j.collect().length === 100500) // 100k hot + 500 odd keys <= 1000
      // the FINAL adaptive plan (inspect after execution) must carry the
      // OptimizeSkewedJoin marker: the hot partition was split
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin(skew=true)"),
        s"AQE skew-join did not engage:\n$plan")
    }
  }

  /** Pin session confs for `body` (broadcast off = the regime saltedJoin
    * targets; AQE knobs for the skew spec), restoring previous values. */
  private def withConfs[T](keys: Seq[(String, String)])(body: => T): T = {
    val prev = keys.map { case (k, _) => k -> spark.conf.get(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  private def withNoBroadcast[T](body: => T): T =
    withConfs(Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false"))(body)

  test("asOf hardening: deterministic largest-struct tiebreak on time " +
    "collisions, null right time never matches, right-only columns " +
    "don't leak as phantom nulls") {
    val clicks = Seq((1L, 7L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    // two purchases at the IDENTICAL timestamp: the larger carried
    // struct (pts, pvalue) must win deterministically, on any layout
    val duped = Seq(
      (7L, ts("2024-01-01 11:00:00"), 3.0),
      (7L, ts("2024-01-01 11:00:00"), 8.0)
    ).toDF("user_id", "pts", "pvalue")
    for (parts <- Seq(1, 7)) {
      val got = AsOfJoin.asOf(clicks, duped.repartition(parts),
          "user_id", "ts", "pts", Seq("pvalue"))
        .select("asof_pvalue").as[Double].head()
      assert(got === 8.0, s"parts=$parts")
    }
    // a null right time sorts first but can never satisfy pts <= ts —
    // it must carry nothing
    val nullT = Seq(
      (7L, null.asInstanceOf[Timestamp], 99.0),
      (7L, ts("2024-01-01 13:00:00"), 1.0) // after the click
    ).toDF("user_id", "pts", "pvalue")
    val gotN = AsOfJoin.asOf(clicks, nullT, "user_id", "ts", "pts",
        Seq("pvalue"))
      .select("asof_pvalue").as[Option[Double]].head()
    assert(gotN === None)
    // right-only columns NOT in rightCols must not leak into the output
    val extra = Seq((7L, ts("2024-01-01 11:00:00"), 5.0, "leaky"))
      .toDF("user_id", "pts", "pvalue", "note")
    val cols = AsOfJoin.asOf(clicks, extra, "user_id", "ts", "pts",
      Seq("pvalue")).columns.toSeq
    assert(!cols.contains("note") && !cols.contains("pts"))
    assert(cols.contains("asof_pvalue"))
  }

  test("skew operators refuse __salt/overlap collisions loudly") {
    val fact = Seq((1L, "k", 2.0)).toDF("id", "k", "__salt")
    intercept[IllegalArgumentException] {
      Skew.saltedSumCount(fact, col("k"), col("__salt"), col("id"))
    }
    val dim = Seq(("k", 1)).toDF("k", "d")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, Seq("k"), col("id"))
    }
    val factOk = Seq((1L, "k", 2.0)).toDF("id", "k", "v")
    val dimClash = Seq(("k", 9.0)).toDF("k", "v") // non-key overlap
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(factOk, dimClash, Seq("k"), col("id"))
    }
    assert(e.getMessage.contains("both sides"))
  }
}
