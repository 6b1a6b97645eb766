package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for a step sequence
  * (s₁, …, s_k), a user reaches step i at the EARLIEST s_i-event strictly
  * after their step-(i−1) time — the standard behavioral-analytics
  * conversion funnel, computed relationally.
  *
  * Shape: step i is one pushed-down `event_type = s_i` filter (reaches
  * the parquet scan) joined to the step-(i−1) reach frame on the user key
  * and min-aggregated — every exchange in the chain is keyed on the
  * high-cardinality user id, the reach frames only ever SHRINK (each is a
  * per-user single row), and AQE broadcasts them against the filtered
  * event slices when they fall under the threshold. Per-user state is one
  * timestamp per step — never a per-user event list, so a power user with
  * 10⁸ events costs the aggregate nothing beyond its partial mins.
  *
  * `funnelUsers` exposes the per-user reach times (t1…tk, null = never
  * reached) for composition; `funnelSummary` reduces them to the k-row
  * conversion table (exact counts; conversion ratios are single IEEE
  * divisions of exact longs — engine-bit-identical).
  */
object Funnel {

  /** Per-user earliest reach time per step. Output: user, t1 … tk. */
  def funnelUsers(events: DataFrame, user: Column, ts: Column,
                  step: Column, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelUsers: empty step sequence")
    require(steps.distinct.size == steps.size,
      s"funnelUsers: duplicate step names in $steps — a repeated stage " +
        "would silently match its own predecessor's events")
    val evt = events.select(user.as("user"), ts.as("ts"),
      step.as("step"))
    // reach frames: r(i) = (user, t_i), shrinking monotonically
    val reaches = steps.zipWithIndex.foldLeft(List.empty[DataFrame]) {
      case (acc, (name, i)) =>
        val slice = evt.where(col("step") === name)
        val r =
          if (i == 0)
            slice.groupBy("user").agg(min(col("ts")).as("t1"))
          else
            slice.join(acc.head.select(col("user"),
                col(s"t$i").as("prev_t")), Seq("user"))
              .where(col("ts") > col("prev_t"))
              .groupBy("user").agg(min(col("ts")).as(s"t${i + 1}"))
        r :: acc
    }.reverse
    // assemble: everyone who entered the funnel, later steps left-joined
    reaches.tail.foldLeft(reaches.head) { (z, r) =>
      z.join(r, Seq("user"), "left")
    }
  }

  /** k-row conversion table: step, name, n_reached, conv_from_prev,
    * conv_from_first. */
  def funnelSummary(events: DataFrame, user: Column, ts: Column,
                    step: Column, steps: Seq[String]): DataFrame = {
    val users = funnelUsers(events, user, ts, step, steps)
    val k = steps.size
    val counts = users.agg(
      count(col("t1")).as("n1"),
      (2 to k).map(i => count(col(s"t$i")).as(s"n$i")): _*)
    val rows = (1 to k).map { i =>
      val conv = (num: Column, den: Column) =>
        when(den === 0, lit(null)).otherwise(num.cast("double") / den)
      struct(lit(i).as("step"), lit(steps(i - 1)).as("name"),
        col(s"n$i").as("n_reached"),
        (if (i == 1) lit(1.0d) else conv(col(s"n$i"), col(s"n${i - 1}")))
          .as("conv_from_prev"),
        (if (i == 1) lit(1.0d) else conv(col(s"n$i"), col("n1")))
          .as("conv_from_first"))
    }
    counts.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
