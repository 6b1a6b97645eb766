package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Stream-stream interval join (the watermark-bounded two-moving-sides
  * tier): batch parity, event-time bounds, cross-microbatch state,
  * watermark eviction of late rows, and left-outer null emission. */
class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // left = impressions, right = clicks; bound = click within
  // [impression, impression + 15 min]
  private val batch1Left = Seq(
    (7L, ts("2024-01-01 10:00:00"), 100L),  // matched by R1 (in-bound)
    (8L, ts("2024-01-01 10:00:00"), 101L),  // R2 out of bound: no match
    (9L, ts("2024-01-01 10:05:00"), 102L))  // matched by R3 from batch 2
  private val batch1Right = Seq(
    (7L, ts("2024-01-01 09:55:00"), 200L),  // BEFORE the anchor: no match
    (7L, ts("2024-01-01 10:10:00"), 201L),  // R1
    (8L, ts("2024-01-01 10:20:00"), 202L))  // R2: 20 min > upper
  private val batch2Left = Seq(
    (97L, ts("2024-01-01 11:00:00"), 103L)) // watermark advance (left)
  private val batch2Right = Seq(
    (9L, ts("2024-01-01 10:12:00"), 203L),  // R3: joins batch-1 state
    (99L, ts("2024-01-01 11:00:00"), 204L)) // watermark advance (right)

  private val focus = Set(7L, 8L, 9L)

  private def drain(name: String): Set[(Long, Long, Option[Long])] =
    spark.table(name)
      .where(col("l_user_id").isin(focus.toSeq: _*))
      .select(col("l_user_id"), col("l_event_id"), col("r_event_id"))
      .as[(Long, Long, Option[Long])].collect().toSet

  test("stream-stream interval join: in-bound rows match across " +
    "microbatches, out-of-bound and pre-anchor rows do not, and the " +
    "streamed result row-matches the batch run of the same operator") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, Timestamp, Long)]
    val rMem = MemoryStream[(Long, Timestamp, Long)]
    val joined = EventStreams.streamStreamIntervalJoin(
      lMem.toDF.toDF("user_id", "ts", "event_id"),
      rMem.toDF.toDF("user_id", "ts", "event_id"))
    val q = joined.writeStream.format("memory").queryName("ssj_inner")
      .outputMode("append").start()
    try {
      lMem.addData(batch1Left: _*); rMem.addData(batch1Right: _*)
      q.processAllAvailable()
      // R3 arrives a batch later than its left partner: keyed state must
      // hold the batch-1 left rows until the watermark clears them
      lMem.addData(batch2Left: _*); rMem.addData(batch2Right: _*)
      q.processAllAvailable()
      val streamed = drain("ssj_inner")
      assert(streamed === Set((7L, 100L, Some(201L)),
        (9L, 102L, Some(203L))))
      // watermark eviction: by now the watermark sits at 10:50 (11:00 −
      // 10 min); a click at 10:07 is 43 min late — dropped at the gate,
      // NOT joined (its batch-mode partner L1 would have matched)
      rMem.addData((7L, ts("2024-01-01 10:07:00"), 205L))
      q.processAllAvailable()
      assert(drain("ssj_inner") === streamed,
        "late row beyond the watermark must not produce a join row")
      // batch parity: the operator is mode-agnostic (watermark is a
      // no-op on static frames) — the same rows minus the late one give
      // the same matches
      val batchOut = EventStreams.streamStreamIntervalJoin(
          (batch1Left ++ batch2Left).toDF("user_id", "ts", "event_id"),
          (batch1Right ++ batch2Right).toDF("user_id", "ts", "event_id"))
        .where(col("l_user_id").isin(focus.toSeq: _*))
        .select(col("l_user_id"), col("l_event_id"), col("r_event_id"))
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(batchOut === streamed)
    } finally q.stop()
  }

  test("stream-stream left-outer: unmatched left rows emit with null " +
    "right columns only after the watermark proves them final") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, Timestamp, Long)]
    val rMem = MemoryStream[(Long, Timestamp, Long)]
    val joined = EventStreams.streamStreamIntervalJoin(
      lMem.toDF.toDF("user_id", "ts", "event_id"),
      rMem.toDF.toDF("user_id", "ts", "event_id"), leftOuter = true)
    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      lMem.addData(batch1Left: _*); rMem.addData(batch1Right: _*)
      q.processAllAvailable()
      // user 8's left row is unmatched, but its join window [10:00,
      // 10:15] is still open — the null row MUST NOT have been emitted
      assert(!drain("ssj_outer").exists(r => r._1 == 8L && r._3.isEmpty),
        "outer null emitted before the watermark closed the window")
      lMem.addData(batch2Left: _*); rMem.addData(batch2Right: _*)
      q.processAllAvailable()
      // push the watermark far past every window of interest; an extra
      // cycle lets the no-new-data eviction batch run
      lMem.addData((97L, ts("2024-01-01 13:00:00"), 104L))
      rMem.addData((99L, ts("2024-01-01 13:00:00"), 206L))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(drain("ssj_outer") === Set(
        (7L, 100L, Some(201L)),
        (9L, 102L, Some(203L)),
        (8L, 101L, None)))
    } finally q.stop()
  }
}
