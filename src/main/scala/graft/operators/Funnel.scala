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

  /** Weekly cohort retention: users are cohorted by the ISO week of
    * their first event; retention[c, k] = users of cohort c active in
    * week c+k (distinct-week activity, so a burst of events in one week
    * counts once).
    *
    * ONE exchange on the user key does all the per-user work: a single
    * groupBy collects each user's cohort week AND distinct active weeks
    * (per-user state is bounded by calendar weeks, not event count — a
    * power user with 10⁸ events still carries at most a few hundred
    * week entries). Cohort sizes come from the k=0 cell (every user is
    * by construction active in their cohort week) via a window over the
    * already-tiny retention grid — no second pass over events.
    *
    * Output: cohort (date), week_offset, n_active, n_cohort, retention.
    */
  def cohortRetention(events: DataFrame, user: Column,
                      ts: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events.select(user.as("u"),
      date_trunc("week", ts).cast("date").as("wk"))
    val per = ev.groupBy("u").agg(min(col("wk")).as("cohort"),
      collect_set(col("wk")).as("wks"))
    val grid = per
      .select(col("cohort"), explode(col("wks")).as("wk"))
      .select(col("cohort"),
        (datediff(col("wk"), col("cohort")) / lit(7)).cast("int")
          .as("week_offset"))
      .groupBy("cohort", "week_offset")
      .agg(count(lit(1)).as("n_active")) // (u, wk) pairs already distinct
    grid
      .withColumn("n_cohort",
        max(when(col("week_offset") === 0, col("n_active")))
          .over(Window.partitionBy("cohort")))
      .withColumn("retention",
        col("n_active").cast("double") / col("n_cohort"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * for each observed (state, next-state) pair, the exact transition
    * count and P(next | state) — the behavioral model behind
    * next-action prediction and anomaly scoring on event streams.
    *
    * ONE user-keyed exchange does all sequencing work (the lead window);
    * everything after is state-pair cardinality — tiny regardless of
    * corpus size, so the final per-state normalization window is free.
    * `tiebreak` makes same-timestamp ordering deterministic (event ids
    * at micro resolution DO collide). Probabilities are single IEEE
    * divisions of exact longs — engine-bit-identical.
    *
    * Output: from_state, to_state, n_trans, n_from, p.
    */
  def markovTransitions(events: DataFrame, user: Column, ts: Column,
                        tiebreak: Column, state: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("u").orderBy(col("ts"), col("tb"))
    val seq = events
      .select(user.as("u"), ts.as("ts"), tiebreak.as("tb"),
        state.as("s"))
      .withColumn("t", lead(col("s"), 1).over(w))
      .where(col("t").isNotNull)
    seq.groupBy(col("s").as("from_state"), col("t").as("to_state"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("n_from", sum(col("n_trans"))
        .over(Window.partitionBy("from_state")))
      .withColumn("p", col("n_trans").cast("double") / col("n_from"))
  }
}
