package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** The engine slice of the reference's upload/status surface (SURVEY.md
  * §2.1 S9): a stage-weighted progress channel. The reference drives a
  * polled status struct from per-stage callbacks with hard-coded weight
  * bands — journal metrics 30%, AI analysis 65%, the rest 5%, capped
  * during processing (`app.py:351-371`, weights `:359-366`). Here the
  * same contract is driven by Spark's own scheduler events instead of
  * manual callbacks: a `SparkListener` counts task completions for the
  * jobs each stage submits (scoped via job groups), so progress within a
  * stage is real executor work, not a driver-side guess.
  */
object Progress {

  /** One polled snapshot — the reference's `processing_status` dict:
    * message, overall percent, records done/remaining for the CURRENT
    * stage (tasks here: the unit Spark actually schedules). */
  final case class Status(stage: String, message: String, progress: Double,
                          processed: Long, remaining: Long)

  private final class Counts {
    @volatile var total: Long = 0L
    @volatile var done: Long = 0L
  }

  /** Driver-side tracker over a fixed stage plan. Weights are relative
    * (normalized over their sum, reference-style 30/65/5 works as-is);
    * `cap` reproduces the reference's "never report beyond X until
    * finished" clamp (`app.py:370`, min(80, …)) and is lifted only by
    * `finish()`. Progress is a HIGH-WATER mark: task-count denominators
    * grow as a stage submits more jobs, so the raw fraction can dip —
    * the reported value never does (the reference's polled UI assumes
    * monotonicity).
    *
    * Usage: `tracker.stage("journal") { df1.count() }` — every Spark job
    * the block submits is tagged with the stage's job group and counted
    * by the listener; exiting the block marks the stage's full weight.
    * Call `close()` when done (removes the listener).
    */
  final class StageWeightedTracker(spark: SparkSession,
                                   stages: Seq[(String, Double)],
                                   cap: Double = 100.0) {
    require(stages.nonEmpty && stages.forall(_._2 > 0),
      "stages must be non-empty with positive weights")
    private val weightSum = stages.map(_._2).sum
    private val groupOf =
      stages.map { case (n, _) => n -> s"graft-progress-$n" }.toMap
    private val counts = new ConcurrentHashMap[String, Counts]()
    private val stageOfSparkStage = new ConcurrentHashMap[Int, String]()
    @volatile private var completed: Set[String] = Set.empty
    @volatile private var current: Option[String] = None
    @volatile private var finished = false
    // monotone max via atomic CAS on the double's bit pattern: `status`
    // is a polled API, and two concurrent pollers doing a plain
    // read-modify-write could interleave so a later poll reports a
    // LOWER value — violating the never-decreases contract
    private val highWater = new AtomicLong(java.lang.Double.doubleToLongBits(0.0))
    private def raiseHighWater(v: Double): Double =
      java.lang.Double.longBitsToDouble(
        highWater.accumulateAndGet(java.lang.Double.doubleToLongBits(v),
          (a, b) =>
            if (java.lang.Double.longBitsToDouble(a) >=
                java.lang.Double.longBitsToDouble(b)) a else b))

    private val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        val group = Option(jobStart.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
        group.flatMap(g => groupOf.collectFirst {
          case (name, gid) if gid == g => name
        }).foreach { name =>
          val c = counts.computeIfAbsent(name, _ => new Counts)
          c.synchronized {
            c.total += jobStart.stageInfos.map(_.numTasks.toLong).sum
          }
          jobStart.stageIds.foreach(sid =>
            stageOfSparkStage.put(sid, name))
        }
      }
      override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
        val name = stageOfSparkStage.get(taskEnd.stageId)
        if (name != null) {
          val c = counts.computeIfAbsent(name, _ => new Counts)
          c.synchronized { c.done += 1 }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    /** Run `body` as the named stage: its Spark jobs are tagged and
      * counted; exiting marks the stage complete (full weight). */
    def stage[T](name: String)(body: => T): T = {
      require(groupOf.contains(name), s"undeclared stage '$name'")
      current = Some(name)
      val sc = spark.sparkContext
      sc.setJobGroup(groupOf(name),
        s"graft progress stage: $name", interruptOnCancel = false)
      try {
        val r = body
        // full weight only on SUCCESS: crediting in a finally made a
        // failed stage jump the polled progress FORWARD, and a retry
        // showed the stage complete while re-running
        completed += name
        r
      } finally {
        sc.clearJobGroup()
        current = None
      }
    }

    /** Lift the cap and pin 100% — the reference's final
      * `progress = 100` assignment once the output file exists. */
    def finish(): Unit = { finished = true; raiseHighWater(100.0) }

    def close(): Unit = spark.sparkContext.removeSparkListener(listener)

    /** Polled snapshot, reference-style. Never decreases. */
    def status: Status = {
      val cur = current
      val (done, total) = cur.flatMap(n => Option(counts.get(n)))
        .map(c => (c.done, c.total)).getOrElse((0L, 0L))
      val frac =
        if (total <= 0) 0.0 else math.min(1.0, done.toDouble / total)
      val weightDone = stages.collect {
        case (n, w) if completed.contains(n) => w
      }.sum
      val weightCur = cur.filterNot(completed.contains)
        .flatMap(n => stages.collectFirst { case (`n`, w) => w * frac })
        .getOrElse(0.0)
      val raw = 100.0 * (weightDone + weightCur) / weightSum
      val clamped = if (finished) 100.0 else math.min(cap, raw)
      val hw = raiseHighWater(clamped)
      val stageName = cur.getOrElse(if (finished) "done" else "idle")
      Status(stageName, s"$stageName ($done/$total tasks)",
        math.round(hw * 100.0) / 100.0, done,
        math.max(0L, total - done))
    }
  }

  /** Streaming counterpart: relays `StreamingQueryListener` progress
    * events into the same `Status` shape — one snapshot per microbatch,
    * cumulative input rows as `processed`. With `expectedRows` set the
    * percent interpolates toward it (a bounded replay/backfill); without
    * it the stream is unbounded and percent stays 0 while the row/batch
    * counters advance (the honest answer for an infinite source).
    * Register with `spark.streams.addListener(relay)`.
    *
    * Listeners are SESSION-global — every active stream's progress
    * events arrive here — so the relay tracks exactly ONE query: the
    * one named by `queryId`, or (when unset) whichever query's event
    * arrives first. Events from any other concurrent stream are
    * ignored; without the filter two streams would interleave their
    * row/batch counters into one meaningless total. */
  final class StreamingProgressRelay(expectedRows: Option[Long] = None,
                                     onUpdate: Status => Unit = _ => (),
                                     queryId: Option[java.util.UUID] = None)
      extends StreamingQueryListener {
    // atomics, not volatile read-modify-writes: Spark currently delivers
    // listener events on a single bus thread, but that is undocumented —
    // under concurrent delivery two racing first events must not both
    // win the auto-bind, and two progress events must not lose an
    // increment between them
    private val rows = new AtomicLong(0L)
    private val batches = new AtomicLong(0L)
    private val boundId =
      new java.util.concurrent.atomic.AtomicReference[java.util.UUID](
        queryId.orNull)
    // AtomicReference + monotonic CAS, not a plain @volatile write: the
    // row/batch counters are atomic, but a plain `last = s` is not
    // ordered with them — under concurrent delivery a slower thread
    // could overwrite `last` with a Status built from OLDER totals and
    // status would transiently regress. The CAS only ever replaces a
    // Status with fewer processed rows; `onUpdate` fires only for the
    // snapshots actually installed, so observers see the same monotone
    // sequence `status` does.
    private val last =
      new java.util.concurrent.atomic.AtomicReference[Status](
        Status("stream", "no batches", 0.0, 0L, 0L))

    override def onQueryStarted(
        event: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        event: StreamingQueryListener.QueryProgressEvent): Unit = {
      boundId.compareAndSet(null, event.progress.id)
      if (boundId.get() != event.progress.id) return
      val r = rows.addAndGet(event.progress.numInputRows)
      val b = batches.incrementAndGet()
      val pct = expectedRows match {
        case Some(n) if n > 0 =>
          math.min(100.0, 100.0 * r.toDouble / n)
        case _ => 0.0
      }
      val s = Status("stream",
        s"batch ${event.progress.batchId} ($r rows in $b batches)",
        math.round(pct * 100.0) / 100.0, r,
        expectedRows.map(n => math.max(0L, n - r)).getOrElse(0L))
      var installed = false
      var done = false
      while (!done) {
        val prev = last.get()
        if (s.processed < prev.processed) done = true // stale snapshot
        else if (last.compareAndSet(prev, s)) { installed = true; done = true }
      }
      if (installed) onUpdate(s)
    }

    def status: Status = last.get()
  }
}
