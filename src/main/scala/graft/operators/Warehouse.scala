package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, StringType, TimestampNTZType, TimestampType}

/** Warehouse-maintenance operators: the table-keeping half of a
  * continuously-ingesting pipeline — history tracking, spine completion,
  * profiling, expectation gates, incremental aggregate maintenance and
  * drift flags. The reference runs its pipeline as one-shot batches
  * (main.py:52-352) with no maintained state; these are the operations a
  * standing 100 TB warehouse built on the same data model needs between
  * ingests, expressed as single-shuffle declarative plans.
  *
  * Determinism discipline (oracle exactness): monetary aggregates go
  * through DECIMAL(28,6) before any double cast, derived doubles are a
  * single IEEE division of exact integers, and boolean flags compare
  * integers — never floats (see SparkEntry's float-determinism note).
  */
object Warehouse {

  /** SCD Type-2 history build: collapse an append-only change log into
    * validity intervals — one row per consecutive run of the same `state`
    * per `entity`, with `[valid_from, valid_to)` bounds and an
    * `is_current` flag on the open interval.
    *
    * Classic gaps-and-islands: a change marker per row (null-safe
    * inequality vs `lag`), a running sum turning markers into island ids,
    * one groupBy collapsing islands, and a `lead` window deriving each
    * island's exclusive upper bound from its successor's start.
    *
    * Scale: the marker + island windows and the collapse all key on
    * `entity` — ONE shuffle of the full log (Catalyst reuses the exchange
    * across the two window operators and the partial-aggregated groupBy).
    * The final `lead` window runs over the collapsed islands (≪ log
    * rows). Nothing is ever collected; a 100 TB log shuffles once at
    * entity cardinality.
    *
    * `tiebreak` must complete a total order within (entity, ts) — without
    * it, equal-timestamp rows could island differently run-to-run.
    */
  def scd2History(log: DataFrame, entity: Column, ts: Column,
                  tiebreak: Column, state: Column): DataFrame = {
    val w = Window.partitionBy(col("entity")).orderBy(col("ts"), col("tb"))
    val marked = log.select(entity.as("entity"), ts.as("ts"),
        tiebreak.as("tb"), state.as("state"))
      .withColumn("chg",
        when(not(col("state") <=> lag(col("state"), 1).over(w)), 1L)
          .otherwise(0L))
    // orderBy on unique (ts, tb) — ROWS vs RANGE frame irrelevant
    val islands = marked
      .withColumn("grp", sum(col("chg")).over(w))
      .groupBy(col("entity"), col("grp"))
      .agg(min(col("state")).as("state"), // constant within an island
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
    // (valid_from, grp): two adjacent islands CAN share a start when
    // equal-timestamp rows change state (the tiebreak orders them into
    // distinct islands at one ts) — grp is monotone in event order
    // within the entity, so it extends the successor order to a total
    // one instead of leaving the pair's valid_to assignment run-varying
    val succ = Window.partitionBy(col("entity"))
      .orderBy(col("valid_from"), col("grp"))
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(succ))
      .select(col("entity"), col("state"), col("valid_from"),
        col("valid_to"), col("n_events"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Date-spine completion ("gap fill"): per (key, calendar day) event
    * counts with explicit ZERO rows for days inside the observed global
    * [min, max] span where a key has no events — downstream trend /
    * anomaly logic then never confuses "absent" with "zero".
    *
    * Scale: the fact table aggregates once (partial agg map-side); the
    * spine is |keys| × |days| — bounded by dimensions, not facts — and
    * both spine inputs are 1-row/driver-free aggregates. The spine join
    * broadcasts the DAILY aggregate (days × active keys, always ≪
    * facts), so no second fact shuffle occurs.
    */
  def gapfillDaily(df: DataFrame, key: Column, ts: Column): DataFrame = {
    val tagged = df.select(key.as("key"), to_date(ts).as("day"))
    val daily = tagged.groupBy(col("key"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val span = tagged.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val days = span.select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val keys = tagged.select(col("key")).distinct()
    days.crossJoin(keys)
      .join(broadcast(daily), Seq("key", "day"), "left")
      .select(col("key"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Single-pass long-format column profiler: per profiled column, row /
    * null / distinct counts plus typed extrema — numerics and
    * timestamps as doubles (timestamps as epoch seconds, exact under the
    * UTC session), strings by length. The long shape (one row per
    * column) is what schema-drift monitoring diffs between ingests.
    *
    * Scale: ONE scan. All measures land in a single global aggregate;
    * the per-column rows are exploded from that 1-row frame, so the
    * fact table is never re-read per column. Exact `countDistinct`
    * makes Catalyst plan one Expand (a data multiplier of
    * |cols| + 1) — the right trade at oracle scale; at 100 TB pass
    * `exactDistinct = false` for `approx_count_distinct` (±5%), which
    * collapses the plan back to a plain partial-aggregated scan.
    */
  def profileColumns(df: DataFrame, cols: Seq[String],
                     exactDistinct: Boolean = true): DataFrame = {
    val kinds = cols.map(c => c -> df.schema(c).dataType)
    val nd: String => Column =
      if (exactDistinct) c => countDistinct(col(c))
      else c => approx_count_distinct(col(c))
    val measures = count(lit(1)).as("__n") +: kinds.flatMap { case (c, t) =>
      val (minNum, maxNum) = t match {
        case _: NumericType =>
          (min(col(c)).cast("double"), max(col(c)).cast("double"))
        // NTZ: parquet TIMESTAMP(isAdjustedToUTC=false) arrives as
        // TIMESTAMP_NTZ; under the pinned UTC session the cast to LTZ
        // maps the wall clock to the identical instant (Tables.events)
        case TimestampType | TimestampNTZType | DateType =>
          (unix_timestamp(min(col(c)).cast("timestamp")).cast("double"),
           unix_timestamp(max(col(c)).cast("timestamp")).cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      val (minLen, maxLen) = t match {
        case StringType =>
          (min(length(col(c))).cast("long"), max(length(col(c))).cast("long"))
        case _ => (lit(null).cast("long"), lit(null).cast("long"))
      }
      Seq(count(col(c)).as(s"${c}__nn"), nd(c).cast("long").as(s"${c}__nd"),
        minNum.as(s"${c}__minn"), maxNum.as(s"${c}__maxn"),
        minLen.as(s"${c}__minl"), maxLen.as(s"${c}__maxl"))
    }
    val one = df.agg(measures.head, measures.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__minn").as("min_num"), col(s"${c}__maxn").as("max_num"),
        col(s"${c}__minl").as("min_len"), col(s"${c}__maxl").as("max_len"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Declarative expectation gate (the Deequ shape): a key-uniqueness
    * check plus arbitrary per-row violation predicates, evaluated in ONE
    * aggregate pass; emits `(check, metric, passed)` where `metric`
    * counts violations. Uniqueness folds into the same pass as
    * `count(*) - count(distinct key)` (one Expand, same trade as
    * [[profileColumns]]); row checks are conditional sums — free
    * map-side. Compose with [[riViolations]] for the checks that need a
    * join; a gate that fails should stop the ingest, not the scan.
    */
  def expectations(df: DataFrame, uniqueKeyName: String, uniqueKey: Column,
                   rowChecks: Seq[(String, Column)]): DataFrame = {
    val measures =
      count(lit(1)).as("__n") +: countDistinct(uniqueKey).as("__nd") +:
        rowChecks.map { case (name, violates) =>
          sum(when(violates, 1L).otherwise(0L)).as(s"__c_$name")
        }
    val one = df.agg(measures.head, measures.tail: _*)
    val rows =
      struct(lit(s"${uniqueKeyName}_unique").as("check_name"),
        (col("__n") - col("__nd")).as("metric")) +:
        rowChecks.map { case (name, _) =>
          struct(lit(name).as("check_name"),
            coalesce(col(s"__c_$name"), lit(0L)).as("metric"))
        }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
      .withColumn("passed", col("metric") === 0L)
  }

  /** Referential-integrity expectation: count of fact rows whose key has
    * no match in the dimension, as a 1-row `(check, metric, passed)`
    * frame unionable with [[expectations]]. The anti-join shuffles on
    * the key; AQE converts it to broadcast when the dimension's key
    * projection is small (on this star schema it always is).
    */
  def riViolations(name: String, fact: DataFrame, factKey: Column,
                   dim: DataFrame, dimKey: Column): DataFrame =
    fact.join(dim.select(dimKey.as("__dk")), factKey === col("__dk"),
        "left_anti")
      .agg(count(lit(1)).as("metric"))
      .select(lit(name).as("check_name"), col("metric"),
        (col("metric") === 0L).as("passed"))

  /** Equi-width histogram with a complete bucket spine: `nBuckets` rows,
    * each with its [bucket_lo, bucket_hi) bounds and count — empty
    * buckets surface as explicit zeros (same philosophy as
    * [[gapfillDaily]]). The max value clamps into the last bucket.
    *
    * Determinism: bucket id is `floor((v - lo) / w)` — one subtraction
    * and one IEEE division per row against span constants, then an exact
    * integer clamp; bounds are the same two-operation arithmetic, so
    * every emitted double is bit-stable across engines. Scale: one scan
    * for the span (a 1-row broadcast), one partial-aggregated scan for
    * the counts; the spine join touches `nBuckets` rows.
    */
  def histogram(df: DataFrame, value: Column, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"histogram: nBuckets must be positive: $nBuckets")
    val v = df.select(value.cast("double").as("v"))
      .where(col("v").isNotNull)
    val span = v.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val width = (col("hi") - col("lo")) / lit(nBuckets.toDouble)
    // a CONSTANT column makes width 0 and (v-lo)/width = 0/0 = NaN —
    // engine-dependent NaN ordering would then pick an arbitrary
    // bucket; pin the degenerate case to bucket 0 (all mass, zero-width
    // bounds) deterministically
    val counts = v.crossJoin(broadcast(span))
      .select(when(col("hi") === col("lo"), lit(0.0))
        .otherwise(least(greatest(floor((col("v") - col("lo")) / width),
          lit(0.0)), lit((nBuckets - 1).toDouble)))
        .cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    span
      .select(explode(sequence(lit(0L), lit(nBuckets - 1L))).as("bucket"),
        col("lo"), col("hi"))
      .withColumn("bucket_lo", col("lo") + col("bucket") * width)
      .withColumn("bucket_hi", col("lo") + (col("bucket") + 1) * width)
      .join(broadcast(counts), Seq("bucket"), "left")
      .select(col("bucket"), col("bucket_lo"), col("bucket_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Daily rollup partial: per-day row count and DECIMAL-exact value sum.
    * The decimal stays decimal — that is what makes partials losslessly
    * re-aggregable in [[incrementalDailyRollup]]. */
  def dailyRollup(df: DataFrame, day: Column, value: Column): DataFrame =
    df.groupBy(to_date(day).as("day"))
      .agg(count(lit(1)).as("n_rows"),
        sum(value.cast("decimal(28,6)")).as("sum_value_dec"))

  /** Incremental aggregate maintenance: persist the rollup of the base
    * (pre-cutoff) partition range ONCE as write-once parquet, then serve
    * base ⊎ delta by re-aggregating persisted partials with the delta's
    * partials — the base facts are never rescanned. Because count and
    * decimal-sum are commutative monoids, the merged result is exactly
    * the full recompute (the oracle pins this). This is the aggregate
    * mirror of Dedup.persistIndex/probePersistedIndex: per-ingest cost
    * tracks the DELTA, not the corpus — on a 100 TB warehouse the daily
    * maintenance job reads one day of facts plus a days-sized summary.
    */
  def incrementalDailyRollup(df: DataFrame, day: Column, value: Column,
                             cutoff: Column, path: String): DataFrame = {
    val spark = df.sparkSession
    // write-once FOR REAL: a committed base at `path` is reused, so a
    // per-ingest maintenance job pays delta cost, not a full base
    // rescan+rewrite per call. The path identifies one (base range) —
    // changing the cutoff needs a fresh path (caller contract).
    val basePath = new org.apache.hadoop.fs.Path(path)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed =
      fs.exists(new org.apache.hadoop.fs.Path(basePath, "_SUCCESS"))
    if (!committed)
      dailyRollup(df.where(to_date(day) < cutoff), day, value)
        .write.mode("overwrite").parquet(path)
    val delta = dailyRollup(df.where(to_date(day) >= cutoff), day, value)
    spark.read.parquet(path).unionByName(delta)
      .groupBy(col("day"))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_value_dec")).as("sum_value_dec"))
  }

  /** Trailing-window spike flags: per (key, day) count vs the mean of
    * the previous `lookback` observed days; a day is a spike when
    * `n > (num/den) × trailing_mean`. The flag is a PURE INTEGER
    * comparison (`n·cnt·den > sum·num`) and the reported ratio a single
    * IEEE division of exact integers — bit-stable across engines. Days
    * with no trailing history (the first per key) flag false. Scale: one
    * partial-aggregated groupBy + one window, both keyed on `key`.
    * This form counts RAW FACT rows; to make silent days count as zeros
    * in the baseline, use [[dailySpikesFromDaily]] over
    * [[gapfillDaily]]'s output — feeding the gapfilled frame HERE would
    * count each (key, day) summary row as one event.
    */
  def dailySpikes(df: DataFrame, key: Column, ts: Column,
                  lookback: Int = 7, num: Int = 11, den: Int = 10)
      : DataFrame =
    dailySpikesFromDaily(
      df.select(key.as("key"), to_date(ts).as("day"))
        .groupBy(col("key"), col("day"))
        .agg(count(lit(1)).as("n_events")),
      lookback, num, den)

  /** [[dailySpikes]] over an ALREADY-aggregated `(key, day, n_events)`
    * frame — the form that composes with [[gapfillDaily]], whose
    * explicit zero days must enter the trailing baseline as zeros
    * rather than as one row apiece. Same integer-exact flag and ratio
    * arithmetic. */
  def dailySpikesFromDaily(daily: DataFrame, lookback: Int = 7,
                           num: Int = 11, den: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(-lookback, -1)
    daily
      .withColumn("trail_sum", sum(col("n_events")).over(w))
      .withColumn("trail_cnt", count(lit(1)).over(w))
      .withColumn("ratio",
        (col("n_events") * col("trail_cnt")).cast("double") /
          col("trail_sum"))
      .withColumn("is_spike", coalesce(
        col("n_events") * col("trail_cnt") * den >
          col("trail_sum") * num, lit(false)))
  }

  /** Holt linear-trend forecast (double exponential smoothing) per key
    * over an evenly-spaced series — the trend-aware successor to
    * [[dailySpikes]]' flat trailing mean: after one pass the final
    * (level, trend) pair extrapolates `horizon` steps as
    * level + h·trend. Feed it [[gapfillDaily]]'s output so "absent"
    * days are explicit zeros; a gapped series would smooth across the
    * hole as if no time passed.
    *
    * Recurrence (zero-trend init, the common SQL-replayable variant):
    * l₁ = x₁, t₁ = 0; then lₙ = α·xₙ + (1−α)·(lₙ₋₁ + tₙ₋₁),
    * tₙ = β·(lₙ − lₙ₋₁) + (1−β)·tₙ₋₁. The fold is strictly day-ordered
    * IEEE arithmetic with (1−α)/(1−β) computed by subtraction on BOTH
    * engines, so the doubles sit under the hash oracle (the generated
    * SQL replays the same chain as a recursive CTE).
    *
    * Scale: a sequential recurrence cannot be a window/aggregate — this
    * is the documented per-partition-imperative case: ONE shuffle on
    * the key, values streamed day-sorted through a flatMapSortedGroups
    * fold with O(1) state per key (level, trend, count) — no per-key
    * materialization, group spill handled by the sorter. The input is
    * the DAILY frame (keys × days, dimension-sized), never raw facts.
    *
    * Returns (key, n_obs, level, trend, h, yhat) with one row per
    * (key, 1..horizon). Keys are strings (cast before calling — a
    * forecast frame is a dimension readout, not a typed fact path);
    * null values are excluded like every aggregate would.
    */
  def holtForecast(daily: DataFrame, key: Column, day: Column,
                   value: Column, alpha: Double, beta: Double,
                   horizon: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1,
      s"holtForecast: alpha=$alpha, beta=$beta")
    require(horizon >= 1, s"holtForecast: horizon=$horizon")
    val spark = daily.sparkSession
    import spark.implicits._
    val ds = daily
      .select(key.cast("string").as("k"), day.cast("long").as("d"),
        value.cast("double").as("x"))
      .where(col("k").isNotNull && col("d").isNotNull && col("x").isNotNull)
      .as[(String, Long, Double)]
    ds.groupByKey(_._1)
      .flatMapSortedGroups($"d") { (k: String,
                                    it: Iterator[(String, Long, Double)]) =>
        var n = 0L; var l = 0.0; var t = 0.0
        it.foreach { case (_, _, x) =>
          if (n == 0L) { l = x; t = 0.0 }
          else {
            val nl = alpha * x + (1 - alpha) * (l + t)
            t = beta * (nl - l) + (1 - beta) * t
            l = nl
          }
          n += 1L
        }
        (1 to horizon).map(h => (k, n, l, t, h.toLong, l + h * t))
      }
      .toDF("key", "n_obs", "level", "trend", "h", "yhat")
  }

  /** Holt-Winters ADDITIVE seasonal forecast per key — `holtForecast`
    * plus a `period`-slot seasonal state (Winters 1960): for
    * observation n ≥ 1 at phase si = n mod period,
    *
    *   l' = α(x − s[si]) + (1−α)(l + t)
    *   t' = β(l' − l) + (1−β)t
    *   s[si]' = γ(x − l') + (1−γ)s[si]
    *
    * with the first observation seeding l = x, t = 0 and all seasonal
    * slots 0 (the indices LEARN through γ — no closed-form init, so
    * the chain is a pure left fold the recursive-CTE oracle replays
    * IEEE-op-for-op, carrying the slot array as a DOUBLE[] column).
    * Forecast ŷ_h = l + h·t + s[(n−1+h) mod period].
    *
    * Seasonality is POSITIONAL (slot = observation index mod period),
    * which equals day-of-week exactly when the input is the contiguous
    * gapfilled daily frame — same contract as `holtForecast`; feeding
    * gappy days would silently rotate the phase, which is why both
    * document `gapfillDaily` as the upstream.
    *
    * Scale: identical to `holtForecast` — one key shuffle, a day-sorted
    * fold with O(period) state per key, output horizon rows per key.
    */
  def holtWintersForecast(daily: DataFrame, key: Column, day: Column,
                          value: Column, alpha: Double, beta: Double,
                          gamma: Double, period: Int,
                          horizon: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1 &&
      gamma >= 0 && gamma <= 1,
      s"holtWintersForecast: alpha=$alpha, beta=$beta, gamma=$gamma")
    require(period >= 2 && period <= 366,
      s"holtWintersForecast: period=$period")
    require(horizon >= 1, s"holtWintersForecast: horizon=$horizon")
    val spark = daily.sparkSession
    import spark.implicits._
    val ds = daily
      .select(key.cast("string").as("k"), day.cast("long").as("d"),
        value.cast("double").as("x"))
      .where(col("k").isNotNull && col("d").isNotNull && col("x").isNotNull)
      .as[(String, Long, Double)]
    ds.groupByKey(_._1)
      .flatMapSortedGroups($"d") { (k: String,
                                    it: Iterator[(String, Long, Double)]) =>
        var n = 0L; var l = 0.0; var t = 0.0
        val s = new Array[Double](period)
        it.foreach { case (_, _, x) =>
          if (n == 0L) { l = x; t = 0.0 }
          else {
            val si = (n % period).toInt
            val nl = alpha * (x - s(si)) + (1 - alpha) * (l + t)
            t = beta * (nl - l) + (1 - beta) * t
            s(si) = gamma * (x - nl) + (1 - gamma) * s(si)
            l = nl
          }
          n += 1L
        }
        (1 to horizon).map { h =>
          val phase = ((n - 1 + h) % period).toInt
          (k, n, l, t, s(phase), h.toLong, l + h * t + s(phase))
        }
      }
      .toDF("key", "n_obs", "level", "trend", "season", "h", "yhat")
  }

  /** Per-key ordinary-least-squares trendline — grouped simple linear
    * regression of `y` on `x`, the per-segment "is this metric growing
    * and how fast" readout a warehouse computes over thousands of keys
    * at once (per event type, per source, per tenant). Complements
    * [[holtForecast]]: Holt adapts to the recent past, the OLS line is
    * the global least-squares fit with a goodness-of-fit (r²).
    *
    * Exactness discipline (why NOT `regr_slope`): built-in regression
    * aggregates accumulate FLOAT sums in engine-specific order, so two
    * engines disagree in the last ulp. Here every sufficient statistic
    * (n, Σx, Σy, Σxy, Σx², Σy², max x) is an EXACT integer/decimal —
    * order-independent, partial-aggregable, no fold discipline needed —
    * and the floats appear only in a fixed textual expression over
    * their correctly-rounded double casts:
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
    *   intercept = (Σy − slope·Σx) / n
    *   r² = num² / (den·(n·Σy² − Σy·Σy))
    * Each IEEE op is exactly rounded and both engines evaluate the same
    * tree, so raw doubles sit under the hash oracle. Degenerate keys
    * (constant x → den = 0, or constant y → var_y = 0) yield NULL
    * slope/intercept/r² instead of ±Inf/NaN.
    *
    * Scale: ONE partial+final hash aggregate over the fact frame — the
    * cheapest possible shape; no window, no sort, no collect. `x` must
    * fit a long (day ordinals, epochs — any long is exact, including
    * epoch nanoseconds); `y` is bounded by DECIMAL(18,6) per
    * observation; sufficient statistics live in DECIMAL(38,·), so only
    * aggregate magnitudes beyond 10³⁸ can overflow — loud under ANSI.
    *
    * Returns (key, n_obs, x_max, slope, intercept, r2).
    */
  def linearTrend(facts: DataFrame, key: Column, x: Column,
                  y: Column): DataFrame = {
    val base = facts.select(key.cast("string").as("key"),
        x.cast("long").as("xv"), y.cast("decimal(18,6)").as("yv"))
      .where(col("key").isNotNull && col("xv").isNotNull &&
        col("yv").isNotNull)
    // x² as DECIMAL(38,0) BEFORE the multiply: long·long would wrap;
    // a narrower decimal cast would NULL epoch-scale x (~1.7e18)
    // under non-ANSI and skew the statistics silently — at (38,0) the
    // product of any two longs (< 8.6e37) is exact, so the whole long
    // domain is safe and only aggregate magnitudes beyond 10³⁸ can
    // overflow (loud under ANSI, the engine's standing mode)
    val agg = base.groupBy("key").agg(
      count(lit(1)).as("n_obs"),
      sum(col("xv").cast("decimal(38,0)")).as("sx"),
      sum(col("yv")).as("sy"),
      sum(col("xv").cast("decimal(38,0)") *
        col("xv").cast("decimal(38,0)")).as("sxx"),
      sum(col("xv").cast("decimal(38,0)") * col("yv")).as("sxy"),
      sum(col("yv") * col("yv")).as("syy"),
      max(col("xv")).as("x_max"))
    val nD = col("n_obs").cast("double")
    val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
    val sxxD = col("sxx").cast("double")
    val sxyD = col("sxy").cast("double")
    val syyD = col("syy").cast("double")
    val num = nD * sxyD - sxD * syD
    val den = nD * sxxD - sxD * sxD
    val vy = nD * syyD - syD * syD
    val slope = when(den =!= 0.0, num / den)
    agg.select(col("key"), col("n_obs"), col("x_max"),
      slope.as("slope"),
      when(den =!= 0.0, (syD - slope * sxD) / nD).as("intercept"),
      when(den =!= 0.0 && vy =!= 0.0, (num * num) / (den * vy)).as("r2"))
  }

  /** Extrapolate a [[linearTrend]] frame `horizon` steps past each
    * key's last observed x: ŷ_h = intercept + slope·(x_max + h) — the
    * OLS complement of [[holtForecast]] (global least-squares line vs
    * recency-weighted smoothing). Keys with NULL stats (degenerate
    * fits) are excluded — extrapolating them would be fiction. One
    * generator per row, no shuffle; the float tree is two IEEE ops per
    * forecast over the trend frame's already-pinned doubles. Output:
    * (key, h, yhat), h = 1..horizon. */
  def trendForecast(trend: DataFrame, horizon: Int): DataFrame = {
    require(horizon >= 1 && horizon <= 10000,
      s"trendForecast: horizon=$horizon")
    trend.where(col("slope").isNotNull)
      .select(col("key"), col("x_max"), col("slope"), col("intercept"),
        explode(sequence(lit(1), lit(horizon))).as("h"))
      .select(col("key"), col("h"),
        (col("intercept") + col("slope") *
          (col("x_max").cast("double") + col("h").cast("double")))
          .as("yhat"))
  }

  /** One microbatch of the CONTINUOUS CDC gate — [[applyCdc]] run as a
    * `foreachBatch` body over a VERSIONED snapshot table (see
    * `EventStreams.startCdcGate` for the stream wiring): plain parquet
    * made safely replayable without a transactional table format.
    *
    * Layout: `tableDir/v=<epoch>/` holds the FULL snapshot as of that
    * epoch, committed by a `_GRAFT_COMMITTED` marker inside the version
    * directory, written LAST; `tableDir/meta/` records the key and
    * payload columns once, at bootstrap, under the same
    * marker-plus-errorIfExists write-once contract as the index gates
    * (`Dedup.ingestGateBatch`) — later epochs READ the contract from
    * meta and refuse a drifted caller, so two epochs can never fold
    * with different keys.
    *
    * Exactly-once: the base of epoch N is the newest COMMITTED version
    * with v < N — a SELF-EXCLUDING read, so a replayed epoch (crash
    * after data write, before the streaming offset commit) re-folds the
    * SAME base with the SAME at-least-once batch and rewrites
    * `v=N` byte-identically (mode overwrite clears the partial or
    * committed previous attempt, marker re-created after). A crash
    * mid-write leaves `v=N` without a marker — invisible to readers
    * ([[readSnapshot]]) and replaced wholesale on replay. Unlike the
    * append-only gates, nothing is partition-appended: a snapshot epoch
    * REPLACES state, so versioning (not dynamic partition overwrite) is
    * what makes at-least-once replay idempotent.
    *
    * Scale: each epoch costs one [[applyCdc]] fold (feed-keyed window +
    * full-outer join) plus a full snapshot rewrite — the plain-parquet
    * price; at 100 TB the base is bucketed/partitioned storage and the
    * rewrite is the compaction a format like Iceberg amortizes, which
    * is exactly why [[compactSnapshots]] exists to bound the version
    * count. Empty batches write nothing (no empty versions).
    */
  def cdcGateBatch(tableDir: String, keyCols: Seq[String],
                   payloadCols: Seq[String], ord: Column,
                   tiebreak: Column, op: Column)
                  (batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    import spark.implicits._
    require(keyCols.nonEmpty && keyCols.forall(payloadCols.contains),
      s"cdcGateBatch: keyCols ${keyCols.mkString(",")} must be a subset " +
        s"of payloadCols ${payloadCols.mkString(",")}")
    val metaCommitted =
      new org.apache.hadoop.fs.Path(s"$tableDir/meta/_GRAFT_COMMITTED")
    val metaDir = new org.apache.hadoop.fs.Path(s"$tableDir/meta")
    val fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bootstrap = !fs.exists(metaCommitted)
    val bootstrapEpoch = if (bootstrap) None else {
      // the fold contract comes FROM meta: a caller whose keys/payload
      // drifted from the bootstrap's fails loudly instead of silently
      // merging a different table
      val m = spark.read.parquet(s"$tableDir/meta").collect()(0)
      val (mk, mp) = (m.getString(0), m.getString(1))
      require(mk == keyCols.mkString(",") &&
          mp == payloadCols.mkString(","),
        s"cdcGateBatch: persisted contract (keys=$mk, payload=$mp) != " +
          s"caller (keys=${keyCols.mkString(",")}, " +
          s"payload=${payloadCols.mkString(",")})")
      Some(metaBootstrapEpoch(m))
    }
    val baseV = replayBaseVersion(committedVersions(fs, tableDir),
      batchId, bootstrapEpoch, "cdcGateBatch")
    val base = baseV match {
      case Some(v) => spark.read.parquet(s"$tableDir/v=$v")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          payloadCols.map(c => batch.schema(c))))
    }
    val next = applyCdc(base, batch, keyCols, ord, tiebreak, op)
    val vDir = s"$tableDir/v=$batchId"
    next.write.mode("overwrite").parquet(vDir)
    if (bootstrap) {
      if (fs.exists(metaDir)) fs.delete(metaDir, true)
      Seq((keyCols.mkString(","), payloadCols.mkString(","), batchId))
        .toDF("key_cols", "payload_cols", "bootstrap_epoch").coalesce(1)
        .write.mode("errorifexists").parquet(s"$tableDir/meta")
      fs.create(metaCommitted, false).close()
    }
    // marker LAST: the version is invisible until the snapshot is whole
    fs.create(
      new org.apache.hadoop.fs.Path(s"$vDir/_GRAFT_COMMITTED"), false)
      .close()
  }

  /** The newest committed snapshot under a [[cdcGateBatch]] table — the
    * reader's entry point, safe mid-stream (uncommitted versions are
    * invisible). */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
                   tableDir: String): DataFrame = {
    val dir = new org.apache.hadoop.fs.Path(tableDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = committedVersions(fs, tableDir)
    require(vs.nonEmpty, s"readSnapshot: no committed version in $tableDir")
    spark.read.parquet(s"$tableDir/v=${vs.max}")
  }

  /** Drop all but the newest `keep` committed snapshot versions — the
    * small-file/version maintenance [[cdcGateBatch]] needs at scale
    * (every epoch is a full snapshot). Always refuses to touch the
    * newest version; uncommitted (torn) versions older than the newest
    * committed one are garbage from crashed epochs and are removed too.
    * Returns the removed version numbers.
    *
    * While a stream is live, run with `keep >= 2`: `keep = 1` leaves an
    * at-least-once REPLAY of the newest epoch without its base version,
    * which the gates refuse loudly rather than fold into data loss. */
  def compactSnapshots(spark: org.apache.spark.sql.SparkSession,
                       tableDir: String, keep: Int = 2): Seq[Long] = {
    require(keep >= 1, s"compactSnapshots: keep=$keep")
    val dir = new org.apache.hadoop.fs.Path(tableDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = committedVersions(fs, tableDir).sorted
    if (committed.isEmpty) return Nil
    val cutoff = committed.takeRight(keep).head
    val all = fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .map(p => p.getName.stripPrefix("v=").toLong)
    val drop = all.filter(_ < cutoff).sorted
    drop.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/v=$v"), true)
    }
    drop
  }

  private def committedVersions(fs: org.apache.hadoop.fs.FileSystem,
                                tableDir: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(tableDir)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .filter(p => fs.exists(
        new org.apache.hadoop.fs.Path(p, "_GRAFT_COMMITTED")))
      .map(_.getName.stripPrefix("v=").toLong)
  }

  /** `bootstrap_epoch` off a gate's meta row, defaulting to 0 for
    * tables persisted before the column existed (their bootstrap was
    * epoch 0 in every real stream). The column is appended LAST so
    * positional reads of the older columns stay valid. */
  private def metaBootstrapEpoch(row: org.apache.spark.sql.Row): Long =
    row.schema.fieldNames.indexOf("bootstrap_epoch") match {
      case -1 => 0L
      case i => row.getLong(i)
    }

  /** THE replay-base resolution shared by the versioned-snapshot gates
    * (one definition — the refusal semantics must never diverge): the
    * self-excluding base of epoch N is the newest committed version
    * < N. An EMPTY base is legitimate only when nothing is committed
    * yet (bootstrap, or a bootstrap-crash replay) or when the epoch is
    * at or before the recorded bootstrap epoch (the bootstrap epoch's
    * own at-least-once replay — no earlier version ever existed, and
    * leading EMPTY stream batches can push the bootstrap past epoch
    * 0, which is why the epoch is recorded in meta instead of assuming
    * 0). Any other empty base means compaction removed the replay's
    * base version, and folding the batch alone would silently drop all
    * accumulated state — refused loudly (review r9s4). */
  private def replayBaseVersion(committed: Seq[Long], batchId: Long,
                                bootstrapEpoch: Option[Long],
                                gate: String): Option[Long] = {
    val baseV = committed.filter(_ < batchId).sorted.lastOption
    require(baseV.nonEmpty || committed.isEmpty ||
        bootstrapEpoch.exists(batchId <= _),
      s"$gate: replay of epoch $batchId has no committed base version " +
        s"(surviving: ${committed.sorted.mkString(",")}) — compaction " +
        "removed the replay base; restore an older version or advance " +
        "the stream checkpoint past this epoch")
    baseV
  }

  /** Continuous DISTINCT counting — daily HLL registers maintained as a
    * versioned snapshot table (the [[cdcGateBatch]] layout: full
    * snapshot per epoch under `v=<epoch>/`, marker-last, self-excluding
    * base read), folded by per-day elementwise MAX of the batch's
    * sketches into the newest committed version.
    *
    * Why a sketch gate and not a distinct-user table: the state is
    * m ints per DAY — bytes, not users — and the fold is idempotent at
    * the ITEM level (max of a max), so at-least-once replay needs no
    * epoch bookkeeping at all: replaying an epoch, even with its rows
    * duplicated by the source, rewrites the version register-identically
    * (`q_sketch_hll_rolling` pins merge ≡ recompute; the replay spec
    * pins the gate). That idempotence is exactly what GK/HLL++ style
    * merge-order-sensitive state cannot offer.
    *
    * The register width is pinned in `meta/` at bootstrap; an epoch
    * arriving with a different `hexChars` fails loudly (registers of
    * different widths would max-merge garbage). Readers answer "uniques
    * over any date range" via [[uniquesOverRange]] without ever
    * re-scanning events; [[compactSnapshots]] bounds version count.
    */
  def uniquesGateBatch(tableDir: String, hexChars: Int,
                       dayCol: String, itemCol: String)
                      (batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    import spark.implicits._
    require(hexChars >= 2 && hexChars <= 3,
      s"uniquesGateBatch: hexChars=$hexChars out of [2, 3]")
    val m = 1 << (4 * hexChars)
    val metaCommitted =
      new org.apache.hadoop.fs.Path(s"$tableDir/meta/_GRAFT_COMMITTED")
    val metaDir = new org.apache.hadoop.fs.Path(s"$tableDir/meta")
    val fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bootstrap = !fs.exists(metaCommitted)
    val bootstrapEpoch = if (bootstrap) None else {
      val row = spark.read.parquet(s"$tableDir/meta").collect()(0)
      require(row.getInt(0) == hexChars,
        s"uniquesGateBatch: persisted hexChars=${row.getInt(0)} != " +
          s"caller $hexChars — registers of different widths cannot " +
          "merge")
      Some(metaBootstrapEpoch(row))
    }
    val baseV = replayBaseVersion(committedVersions(fs, tableDir),
      batchId, bootstrapEpoch, "uniquesGateBatch")
    val base = baseV match {
      case Some(v) => spark.read.parquet(s"$tableDir/v=$v")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("day", DateType),
          org.apache.spark.sql.types.StructField("sk",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.IntegerType, false)))))
    }
    val batchSk = batch
      .select(col(dayCol).cast("date").as("day"),
        col(itemCol).cast("string").as("item"))
      .groupBy("day")
      .agg(graft.functions.SketchAggregates.hllSketch(col("item"),
        hexChars).as("sk"))
    val zeros = typedlit(Array.fill(m)(0))
    val next = base.select(col("day"), col("sk").as("a"))
      .join(batchSk.select(col("day"), col("sk").as("b")),
        Seq("day"), "full_outer")
      .select(col("day"),
        zip_with(coalesce(col("a"), zeros), coalesce(col("b"), zeros),
          (x, y) => greatest(x, y)).as("sk"))
    val vDir = s"$tableDir/v=$batchId"
    next.write.mode("overwrite").parquet(vDir)
    if (bootstrap) {
      if (fs.exists(metaDir)) fs.delete(metaDir, true)
      Seq((hexChars, batchId)).toDF("hex_chars", "bootstrap_epoch")
        .coalesce(1)
        .write.mode("errorifexists").parquet(s"$tableDir/meta")
      fs.create(metaCommitted, false).close()
    }
    fs.create(
      new org.apache.hadoop.fs.Path(s"$vDir/_GRAFT_COMMITTED"), false)
      .close()
  }

  /** Estimated distinct items over an inclusive [from, to] date range,
    * answered from a [[uniquesGateBatch]] table's newest committed
    * snapshot — elementwise-max of the covered days' registers, then
    * the deterministic estimate fold; zero scans of the fact table.
    * Register width comes FROM the persisted meta (the build/read
    * contract). Returns one row (n_days, n_hit, n_est); an empty range
    * yields (0, 0, null) rather than a fabricated estimate. */
  def uniquesOverRange(spark: org.apache.spark.sql.SparkSession,
                       tableDir: String, from: String,
                       to: String): DataFrame = {
    val hexChars = spark.read.parquet(s"$tableDir/meta")
      .collect()(0).getInt(0)
    val merged = readSnapshot(spark, tableDir)
      .where(col("day") >= lit(from).cast("date") &&
        col("day") <= lit(to).cast("date"))
      .select(col("day"), posexplode(col("sk")).as(Seq("idx", "r")))
      .groupBy("idx").agg(max(col("r")).as("r"),
        countDistinct(col("day")).as("nd"))
      .agg(collect_list(struct(col("idx"), col("r"))).as("xs"),
        coalesce(max(col("nd")), lit(0L)).as("n_days"))
    merged.select(col("n_days"),
      graft.functions.SketchAggregates.hllHitsFromCells(col("xs"))
        .as("n_hit"),
      when(size(col("xs")) === 0, lit(null).cast("double"))
        .otherwise(graft.functions.SketchAggregates
          .hllEstimateFromCells(col("xs"), hexChars))
        .as("n_est"))
  }

  /** CDC snapshot apply — the MERGE INTO shape (SCD Type-1: latest
    * state wins, no history) over a plain-parquet base, for engines
    * without a transactional table format: fold a change feed of
    * I/U/D (insert / update / delete) rows into the base snapshot and
    * return the NEXT snapshot with exactly the base's schema.
    *
    * Semantics: per key, only the LATEST change by (`ord`, `tiebreak`)
    * applies — earlier changes in the same feed are superseded, so
    * replaying a feed that was already folded in is idempotent.
    * I and U both upsert (an U for an absent key inserts — the
    * at-least-once-feed convention; CDC streams routinely replay an
    * update whose insert was already compacted away), D removes the
    * key, and a D for an absent key is a no-op. Any other op code
    * fails the job loudly (a typo'd op silently dropping rows is the
    * worst failure mode a snapshot maintainer can have). `tiebreak`
    * must complete a total order within (key, ord) — the same
    * determinism contract as [[scd2History]].
    *
    * `changes` must carry every base column (the full-row payload —
    * the Debezium "after" image) plus whatever `ord`/`tiebreak`/`op`
    * reference. Column-subset updates are the caller's join before the
    * fold.
    *
    * Scale: one key-shuffle of the feed for the latest-change window
    * (rank-1, so Catalyst plans a partial WindowGroupLimit below the
    * exchange — map tasks pre-prune superseded changes), one
    * key-shuffle each side for the full-outer join; the base is never
    * windowed. Feed ≪ base in steady state, so AQE turns the join's
    * build side into a broadcast when the day's feed is small.
    */
  def applyCdc(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
               ord: Column, tiebreak: Column, op: Column): DataFrame = {
    require(keyCols.nonEmpty, "applyCdc: keyCols is empty")
    val payload = base.columns.toSeq
    val missing = payload.filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"applyCdc: changes is missing base columns ${missing.mkString(", ")}")
    val opChecked = when(op.isin("I", "U", "D"), op)
      .otherwise(raise_error(concat(lit("applyCdc: unknown op '"), op,
        lit("' (expected I/U/D)"))))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ord.desc, tiebreak.desc)
    val latest = changes
      .withColumn("__op", opChecked)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select((keyCols.map(col) :+ col("__op")) ++
        payload.filterNot(keyCols.contains)
          .map(c => col(c).as(s"__c_$c")): _*)
    base.join(latest, keyCols, "full_outer")
      .where(col("__op").isNull || col("__op") =!= "D")
      .select(payload.map { c =>
        if (keyCols.contains(c)) col(c)
        else when(col("__op").isNotNull, col(s"__c_$c"))
          .otherwise(col(c)).as(c)
      }: _*)
  }
}
