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

  test("cohortRetention: hand-built two-cohort grid — distinct-week " +
    "activity, k=0 equals cohort size, gaps leave missing cells") {
    // week anchors (Mondays, UTC): w0 = 2024-01-01, w1 = +7d, w2 = +14d
    def at(week: Int, dayOff: Int = 0) =
      Timestamp.valueOf(java.time.LocalDateTime
        .of(2024, 1, 1 + week * 7 + dayOff, 10, 0))
    val events = Seq(
      // cohort w0: users 1, 2. user 1 active w0 (twice), w1;
      // user 2 active w0, w2 (skips w1)
      (1L, at(0)), (1L, at(0, 1)), (1L, at(1)),
      (2L, at(0)), (2L, at(2)),
      // cohort w1: user 3 active w1 only
      (3L, at(1))
    ).toDF("user_id", "ts")
    val got = Funnel.cohortRetention(events, col("user_id"), col("ts"))
      .select("cohort", "week_offset", "n_active", "n_cohort", "retention")
      .orderBy("cohort", "week_offset")
      .as[(java.sql.Date, Int, Long, Long, Double)].collect().toSeq
    val w0 = java.sql.Date.valueOf("2024-01-01")
    val w1 = java.sql.Date.valueOf("2024-01-08")
    assert(got === Seq(
      (w0, 0, 2L, 2L, 1.0),
      (w0, 1, 1L, 2L, 0.5),
      (w0, 2, 1L, 2L, 0.5),
      (w1, 0, 1L, 1L, 1.0)))
  }

  test("streaming funnelConversions: batch parity on in-order delivery, " +
    "one emission per completion, state evicted after converting") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.{FunnelEvent, FunnelConversion}
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "buy")
    // three users: 1 completes across batches, 2 stalls at click,
    // 5 completes within one batch; plus decoys (wrong order, dups)
    val all = Seq(
      FunnelEvent(1L, ts(1), "view"), FunnelEvent(1L, ts(2), "click"),
      FunnelEvent(2L, ts(1), "buy"),  // out of order: ignored
      FunnelEvent(2L, ts(2), "view"), FunnelEvent(2L, ts(3), "click"),
      FunnelEvent(5L, ts(4), "view"), FunnelEvent(5L, ts(5), "click"),
      FunnelEvent(5L, ts(6), "buy"),
      FunnelEvent(1L, ts(7), "view"), // later re-view: must not move t1
      FunnelEvent(1L, ts(8), "buy")   // completes user 1
    )
    val (b1, b2) = all.splitAt(6) // ts-ordered per user across the split
    val mem = MemoryStream[FunnelEvent]
    val q = EventStreams.funnelConversions(mem.toDS(), steps)
      .writeStream.format("memory").queryName("funnel_conv")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      import spark.implicits._
      val got = spark.table("funnel_conv").as[FunnelConversion]
        .collect().map(c => c.user_id -> c.step_ts.map(_.getTime / 1000))
        .toMap
      // batch-operator parity on the union
      val batch = Funnel.funnelUsers(
          all.map(e => (e.user_id, e.ts, e.event_type))
            .toDF("user_id", "ts", "event_type"),
          col("user_id"), col("ts"), col("event_type"), steps)
        .where(col("t3").isNotNull)
        .as[(Long, Timestamp, Timestamp, Timestamp)].collect()
        .map(r => r._1 -> Seq(r._2, r._3, r._4).map(_.getTime / 1000))
        .toMap
      assert(got === batch)
      assert(got === Map(1L -> Seq(1L, 2L, 8L), 5L -> Seq(4L, 5L, 6L)))
      // a stray post-completion event must NOT re-emit user 5
      mem.addData(FunnelEvent(5L, ts(9), "buy")); q.processAllAvailable()
      assert(spark.table("funnel_conv").count() === 2)
    } finally q.stop()
  }

  test("streaming funnelConversions: an abandoned journey is EVICTED " +
    "once the watermark passes its last progress + TTL — stale partial " +
    "state can never complete, a fresh full replay can") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.{FunnelEvent, FunnelConversion}
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "buy")
    def dayTs(d: Double) = new Timestamp((d * 86400000L).toLong)
    val mem = MemoryStream[FunnelEvent]
    val q = EventStreams.funnelConversions(mem.toDS(), steps,
        abandonAfterDays = 7)
      .writeStream.format("memory").queryName("funnel_evict")
      .outputMode("append").start()
    try {
      // user 1 stalls at step 1 on day 0 (state TTL = day 7)
      mem.addData(FunnelEvent(1L, dayTs(0), "view"))
      q.processAllAvailable()
      // user 9's day-20 event moves the watermark to day 13 (> TTL)...
      mem.addData(FunnelEvent(9L, dayTs(20), "view"))
      q.processAllAvailable()
      // ...and a trigger where user 1 has NO data fires their timeout
      mem.addData(FunnelEvent(9L, dayTs(20.1), "click"))
      q.processAllAvailable()
      // user 1's old progress is gone: click/buy alone must NOT convert
      mem.addData(FunnelEvent(1L, dayTs(21), "click"),
        FunnelEvent(1L, dayTs(21.5), "buy"))
      q.processAllAvailable()
      assert(spark.table("funnel_evict").count() === 0)
      // a fresh FULL journey converts with the NEW times — proof the
      // day-0 state (which would have yielded step_ts(0)=day 0) is gone
      mem.addData(FunnelEvent(1L, dayTs(22), "view"),
        FunnelEvent(1L, dayTs(23), "click"),
        FunnelEvent(1L, dayTs(24), "buy"))
      q.processAllAvailable()
      import spark.implicits._
      val got = spark.table("funnel_evict").as[FunnelConversion].collect()
      assert(got.length === 1)
      assert(got(0).user_id === 1L)
      assert(got(0).step_ts.map(_.getTime).toSeq ===
        Seq(22L, 23L, 24L).map(_ * 86400000L))
    } finally q.stop()
  }

  test("streaming funnelConversions: a NON-advancing event for a journey " +
    "already staler than watermark − TTL drops the state instead of " +
    "poisoning the query with a behind-watermark timeout") {
    // Regression: the handler used to re-arm setTimeoutTimestamp at
    // times.last + TTL unconditionally; for stale state that deadline is
    // at/behind the current watermark, which throws in Spark 4.1 — and the
    // checkpoint replays the batch on restart, a poison pill.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.{FunnelEvent, FunnelConversion}
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "buy")
    def dayTs(d: Double) = new Timestamp((d * 86400000L).toLong)
    val mem = MemoryStream[FunnelEvent]
    val q = EventStreams.funnelConversions(mem.toDS(), steps,
        abandonAfterDays = 7)
      .writeStream.format("memory").queryName("funnel_poison")
      .outputMode("append").start()
    try {
      // user 1 stalls at step 1 on day 0 (deadline = day 7)
      mem.addData(FunnelEvent(1L, dayTs(0), "view"))
      q.processAllAvailable()
      // another user's day-20 event advances the watermark to day 13
      mem.addData(FunnelEvent(9L, dayTs(20), "view"))
      q.processAllAvailable()
      // now user 1 receives another step-1 event. Against the STALE
      // day-0 state it is non-advancing (steps(1)=click) and the old
      // deadline day 7 <= watermark day 13 would poison the re-arm; lazy
      // eviction must instead treat the journey as abandoned and let this
      // event start a FRESH one — exactly what a timeout-then-data
      // sequence would have produced.
      mem.addData(FunnelEvent(1L, dayTs(21), "view"))
      q.processAllAvailable()
      assert(spark.table("funnel_poison").count() === 0)
      // the fresh journey completes with the NEW times — proof the day-0
      // progress is gone (it would have yielded step_ts(0) = day 0)
      mem.addData(FunnelEvent(1L, dayTs(21.25), "click"),
        FunnelEvent(1L, dayTs(21.5), "buy"))
      q.processAllAvailable()
      import spark.implicits._
      val got = spark.table("funnel_poison").as[FunnelConversion].collect()
      assert(got.length === 1)
      assert(got(0).step_ts.map(_.getTime).toSeq ===
        Seq(dayTs(21), dayTs(21.25), dayTs(21.5)).map(_.getTime))
    } finally q.stop()
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

  test("streaming markovTransitions: batch parity on in-order " +
    "delivery, transitions bridge batch boundaries through the " +
    "one-triple state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.{MarkovEvent, Transition}
    implicit val sqlCtx = spark.sqlContext
    val all = Seq(
      MarkovEvent(1L, ts(1), 10L, "a"), MarkovEvent(1L, ts(2), 11L, "b"),
      MarkovEvent(2L, ts(1), 20L, "a"),
      // same-timestamp pair INSIDE one batch: event_id orders b first
      MarkovEvent(3L, ts(3), 31L, "c"), MarkovEvent(3L, ts(3), 30L, "b"),
      // second batch continues both chains across the boundary
      MarkovEvent(1L, ts(5), 12L, "c"), MarkovEvent(2L, ts(6), 21L, "b"))
    val (b1, b2) = all.splitAt(5)
    val mem = MemoryStream[MarkovEvent]
    val q = EventStreams.markovTransitions(mem.toDS())
      .writeStream.format("memory").queryName("markov_tr")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      import spark.implicits._
      val got = spark.table("markov_tr").as[Transition].collect()
        .map(t => (t.from_state, t.to_state))
        .groupBy(identity).view.mapValues(_.length).toMap
      val batch = Funnel.markovTransitions(
          all.map(e => (e.user_id, e.ts, e.event_id, e.event_type))
            .toDF("user_id", "ts", "event_id", "event_type"),
          col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .select("from_state", "to_state", "n_trans")
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3.toInt).toMap
      assert(got === batch)
      // users 1 (a→b→c), 2 (a→b), 3 (b→c via the event-id tiebreak)
      assert(got === Map(("a", "b") -> 2, ("b", "c") -> 2))
    } finally q.stop()
  }

  test("markovTransitions: per-user sequencing with tiebreak, exact " +
    "counts, probabilities normalize per from-state, last events and " +
    "single-event users emit nothing") {
    val events = Seq(
      // user 1: a → b → a → c  (transitions: ab, ba, ac)
      (1L, ts(1), 10L, "a"), (1L, ts(2), 11L, "b"),
      (1L, ts(3), 12L, "a"), (1L, ts(4), 13L, "c"),
      // user 2: a → b          (ab)
      (2L, ts(1), 20L, "a"), (2L, ts(2), 21L, "b"),
      // user 3: same-timestamp pair — the event_id tiebreak (30 < 31)
      // orders a before b, so this contributes an a → b transition
      (3L, ts(5), 31L, "b"), (3L, ts(5), 30L, "a"),
      // user 4: single event — no transition
      (4L, ts(9), 40L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.markovTransitions(events, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .orderBy("from_state", "to_state")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("a", "b", 3L, 4L, 0.75), // user 3's tiebreak puts a before b
      ("a", "c", 1L, 4L, 0.25),
      ("b", "a", 1L, 1L, 1.0)))
  }
}
