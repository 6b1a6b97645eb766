package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the event-time operators (SURVEY.md §2.10
  * ST1/ST4/ST5). The reference has no streaming (`app.py`'s poll loop is
  * the closest analogue); these are the BASELINE.json scale extensions.
  *
  * The batch operators in graft.operators.Events use the same event-time
  * `window`/`session_window` expressions — Structured Streaming just adds
  * a watermark for state eviction. That is the point of the design: one
  * expression vocabulary for both modes.
  *
  * Scale: state is keyed on (window, group) — high cardinality, uniformly
  * distributed; the watermark bounds state size to (watermark horizon /
  * slide) windows per group. Late rows beyond the watermark are dropped
  * exactly like the reference's batch semantics would never see them.
  */
object EventStreams {

  /** ST1 + ST4 — watermarked tumbling-window aggregate over a stream with
    * the events schema (ts, event_type, value). Append-mode capable:
    * windows finalize once the watermark passes their end. */
  def tumblingCounts(stream: DataFrame, width: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** ST5 — stateful streaming dedup: at-most-once per event_id within the
    * watermark horizon (the streaming form of the reference's batch DOI
    * dedup, main.py:101-166 — state bounded instead of a global shuffle). */
  def dedupByKey(stream: DataFrame, keyCol: String = "event_id",
                 watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)
}
