package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Funnel

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("funnelUsers: strictly-after chaining, out-of-order events don't " +
    "count, non-entrants are absent") {
    val events = Seq(
      // A: full funnel in order
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "buy"),
      // B: buy BEFORE view — must not convert past view
      (2L, ts(4), "buy"), (2L, ts(5), "view"),
      // C: click only — never entered (no view)
      (3L, ts(1), "click"),
      // D: click at the SAME instant as view — strictly-after excludes it
      (4L, ts(7), "view"), (4L, ts(7), "click"),
      // A again: a second, later view must not move t1 (min wins)
      (1L, ts(9), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelUsers(events, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "buy"))
      .orderBy("user")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().toSeq
    assert(got === Seq(
      (1L, Some(ts(1)), Some(ts(2)), Some(ts(3))),
      (2L, Some(ts(5)), None, None),
      (4L, Some(ts(7)), None, None)))
  }

  test("funnelSummary: exact counts and ratio columns; guards refuse " +
    "empty and duplicate step lists") {
    val events = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"),
      (2L, ts(1), "view"), (2L, ts(2), "click"),
      (3L, ts(1), "view"),
      (4L, ts(1), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelSummary(events, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "buy"))
      .orderBy("step")
      .as[(Int, String, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got === Seq(
      (1, "view", 4L, Some(1.0), Some(1.0)),
      (2, "click", 2L, Some(0.5), Some(0.5)),
      (3, "buy", 0L, Some(0.0), Some(0.0))))
    intercept[IllegalArgumentException] {
      Funnel.funnelUsers(events, col("user_id"), col("ts"),
        col("event_type"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Funnel.funnelUsers(events, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "view"))
    }
  }
}
