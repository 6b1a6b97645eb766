package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Progress

/** S9 engine slice: stage-weighted progress driven by Spark's scheduler
  * events (batch) and StreamingQueryListener events (streams), with the
  * reference's 30/65/5 weights and in-flight cap. */
class ProgressSpec extends SparkTestBase {
  import spark.implicits._

  private def pollUntil(cond: => Boolean, ms: Long = 5000): Boolean = {
    val deadline = System.currentTimeMillis + ms
    while (!cond && System.currentTimeMillis < deadline) Thread.sleep(20)
    cond
  }

  test("stage-weighted tracker: monotone 0→100, reference weights + cap") {
    val tracker = new Progress.StageWeightedTracker(spark,
      Seq("journal" -> 30.0, "ai" -> 65.0, "excel" -> 5.0), cap = 80.0)
    try {
      val snaps = ArrayBuffer[Double]()
      snaps += tracker.status.progress
      assert(snaps.head === 0.0)

      tracker.stage("journal") {
        spark.range(10000).repartition(4).count()
        // within-stage interpolation is fed by the (async) listener bus:
        // task completions must push progress above 0 but never past the
        // stage's 30% band while the stage is open
        assert(pollUntil(tracker.status.progress > 0.0),
          "listener never counted the stage's tasks")
        val inStage = tracker.status.progress
        assert(inStage <= 30.0, s"mid-stage progress $inStage exceeds band")
        snaps += inStage
      }
      snaps += tracker.status.progress
      assert(snaps.last === 30.0) // stage complete = full weight, exactly

      tracker.stage("ai") { spark.range(10000).repartition(4).count() }
      snaps += tracker.status.progress
      assert(snaps.last === 80.0) // raw 95 clamped to the in-flight cap

      tracker.stage("excel") { spark.range(100).count() }
      snaps += tracker.status.progress
      assert(snaps.last === 80.0) // raw 100, still capped (reference :370)

      tracker.finish()
      snaps += tracker.status.progress
      assert(snaps.last === 100.0)
      assert(snaps.sliding(2).forall(s => s.head <= s.last),
        s"progress not monotone: $snaps")
      assert(tracker.status.stage === "done")
    } finally tracker.close()
  }

  test("tracker rejects undeclared stages and zero weights") {
    val t = new Progress.StageWeightedTracker(spark, Seq("a" -> 1.0))
    try intercept[IllegalArgumentException](t.stage("nope")(()))
    finally t.close()
    intercept[IllegalArgumentException](
      new Progress.StageWeightedTracker(spark, Seq.empty))
  }

  test("streaming relay: per-microbatch status, cumulative rows, " +
    "percent toward expectedRows") {
    implicit val sqlCtx = spark.sqlContext
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Progress.Status]()
    val relay = new Progress.StreamingProgressRelay(
      expectedRows = Some(20L), onUpdate = seen.add(_))
    spark.streams.addListener(relay)
    val mem = MemoryStream[Long]
    val q = mem.toDF.writeStream.format("memory")
      .queryName("progress_relay_test").outputMode("append").start()
    try {
      mem.addData(1L to 10L: _*)
      q.processAllAvailable()
      assert(pollUntil(relay.status.processed >= 10L),
        "relay never saw the first batch")
      assert(relay.status.progress === 50.0)
      assert(relay.status.remaining === 10L)
      mem.addData(11L to 20L: _*)
      q.processAllAvailable()
      assert(pollUntil(relay.status.processed >= 20L))
      assert(relay.status.progress === 100.0)
      assert(relay.status.remaining === 0L)
      // every emitted snapshot was monotone in rows
      val rows = seen.toArray(Array.empty[Progress.Status]).map(_.processed)
      assert(rows.sameElements(rows.sorted), rows.toSeq.toString)
    } finally {
      q.stop()
      spark.streams.removeListener(relay)
    }
  }

  test("streaming relay: with two concurrent queries, counters track only " +
    "the bound query") {
    implicit val sqlCtx = spark.sqlContext
    val memA = MemoryStream[Long]
    val memB = MemoryStream[Long]
    val qA = memA.toDF.writeStream.format("memory")
      .queryName("relay_two_a").outputMode("append").start()
    val qB = memB.toDF.writeStream.format("memory")
      .queryName("relay_two_b").outputMode("append").start()
    // bind explicitly to A: listener events are session-global, so with
    // auto-bind the test would race on which query's event lands first
    val relay = new Progress.StreamingProgressRelay(
      expectedRows = Some(10L),
      queryId = Some(qA.id))
    spark.streams.addListener(relay)
    try {
      // B produces 3x A's rows; a relay without the query-id filter would
      // interleave both streams' counters and overshoot expectedRows
      memA.addData(1L to 10L: _*)
      memB.addData(1L to 30L: _*)
      qA.processAllAvailable()
      qB.processAllAvailable()
      assert(pollUntil(relay.status.processed >= 10L),
        "relay never saw the bound query's batch")
      // give B's events time to arrive (and be correctly ignored)
      memB.addData(31L to 60L: _*)
      qB.processAllAvailable()
      Thread.sleep(200)
      assert(relay.status.processed === 10L,
        s"relay counted rows from the unbound query: ${relay.status}")
      assert(relay.status.progress === 100.0)
    } finally {
      qA.stop(); qB.stop()
      spark.streams.removeListener(relay)
    }
  }
}
