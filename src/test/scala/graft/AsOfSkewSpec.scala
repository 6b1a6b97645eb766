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
}
