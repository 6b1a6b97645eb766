package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-based domain mixture sampling — the data-mixing step of
  * a pretraining pipeline (multilingual / multi-source rebalancing, the
  * `p_d ∝ c_d^α` rule of mT5/XLM-R): derive per-domain quotas from the
  * OBSERVED domain counts under a concavity exponent α (α = 1
  * reproduces natural proportions, α → 0 approaches uniform across
  * domains, α = 0.5 is the common sqrt temperature), then fill each
  * quota with the engine's deterministic md5-rank draw (the
  * `q_sample_stratified` shape — WindowGroupLimit plans a partial
  * per-partition top-k before the domain shuffle).
  *
  * Complements the existing sampling family: `q_train_mixture` applies
  * CONFIGURED per-source rates, `q_sample_stratified` CONFIGURED
  * per-stratum quotas; here the quotas themselves are computed from
  * the data — quota_d = ⌊budget · c_d^α / Σ_e c_e^α⌋ (floor, so the
  * realized total can undershoot `budget` by < |domains|; the exact
  * contract, not a largest-remainder repair).
  *
  * Determinism: for α = 0.5 the weight is `sqrt`, which IEEE 754
  * requires correctly rounded — Java and any libm agree to the BIT, so
  * quotas and weights are cross-engine hash-exact (the Σ rides a
  * domain-ordered sequential fold). Other α use `pow`, which libm only
  * promises to the ulp — same within-engine determinism, but oracles
  * should then hash membership, not the weight column.
  *
  * Scale posture: domains are a tiny set — the count aggregate is
  * partial+final, the quota table broadcasts back, and the only
  * corpus-sized work is one domain-keyed rank window. Driver state:
  * zero (the fold runs in a one-row aggregate, not a collect).
  */
object Mixture {

  /** True for a floating-point NaN/±Infinity — values whose toString
    * image BigDecimal cannot parse. Integral Numbers are always finite. */
  private def isNonFinite(n: java.lang.Number): Boolean = n match {
    case d: java.lang.Double => d.isNaN || d.isInfinite
    case f: java.lang.Float  => f.isNaN || f.isInfinite
    case _                   => false
  }

  /** (domain, n_docs, w, quota): the derived mixture table. A NULL
    * domain gets its own quota row here, but `temperatureSample`'s
    * equi-join never matches it (SQL null ≠ null), so null-domain
    * documents are never drawn — normalize or drop them upstream. */
  def temperatureQuotas(docs: DataFrame, domain: Column, budget: Long,
                        alpha: Double = 0.5): DataFrame = {
    require(budget > 0, s"temperatureQuotas: budget=$budget")
    require(alpha > 0.0 && alpha <= 1.0,
      s"temperatureQuotas: alpha=$alpha out of (0,1]")
    val counts = docs.groupBy(domain.as("domain"))
      .agg(count(lit(1)).as("n_docs"))
    val weighted = counts.withColumn("w",
      if (alpha == 0.5) sqrt(col("n_docs").cast("double"))
      else pow(col("n_docs").cast("double"), lit(alpha)))
    // Σ w as a domain-ordered sequential fold — the engine's standard
    // bit-reproducible sum over a small keyed set. The leading null
    // flag pins NULLS LAST: Spark's struct comparison sorts a null
    // field FIRST while a SQL `ORDER BY domain` fold is NULLS LAST,
    // and a fold-order difference on a null-domain corpus would move
    // tw by an ulp and a quota by 1 at a floor boundary
    val total = weighted
      .agg(aggregate(array_sort(collect_list(struct(
          col("domain").isNull.as("nl"), col("domain"), col("w")))),
          lit(0.0), (acc, s) => acc + s.getField("w"))
        .as("tw"))
    weighted.crossJoin(broadcast(total))
      .select(col("domain"), col("n_docs"), col("w"),
        floor(lit(budget) * col("w") / col("tw")).as("quota"))
  }

  /** The selected rows: (id-named-as-input, domain, rk) — the first
    * `quota_d` documents of each domain in `(md5(id), id)` order.
    *
    * The quota table is collected ONCE (|domains| rows — the same
    * bounded driver-state budget as the k-means centroids): max(quota)
    * and the broadcast join side are both rebuilt from the collected
    * rows, so the corpus-wide count aggregate behind the quotas runs a
    * single time. The rank filter then runs in two steps:
    * `rk <= max(quota)` as a LITERAL — the form WindowGroupLimit turns
    * into a partial per-partition top-k BEFORE the domain exchange (a
    * quota-column comparison from a join defeats it, leaving a full
    * per-domain sort) — then the exact per-domain cut against the
    * broadcast quotas. */
  def temperatureSample(docs: DataFrame, id: Column, domain: Column,
                        budget: Long, alpha: Double = 0.5): DataFrame =
    rankFill(docs, id, domain, temperatureQuotas(docs, domain, budget,
      alpha))

  /** UniMax budget-capped quotas (Chung et al. 2023, "UniMax: Fairer
    * and More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): process domains ASCENDING by corpus size; each
    * gets min(maxEpochs · c_d, an equal share of the remaining
    * budget), and whatever a small domain leaves unused flows forward
    * to the larger ones. Where the temperature rule oversamples the
    * tail by a fixed exponent regardless of how much tail data exists,
    * UniMax caps tail REPETITION at `maxEpochs` and reallocates the
    * reclaimed budget to head domains — the fairer mixture at a fixed
    * token budget.
    *
    * All arithmetic is INTEGER (floor division, min) — quotas
    * hash-match any engine exactly, no libm anywhere. The processing
    * order is (n_docs, domain) ascending with nulls last — exactly the
    * `row_number() OVER (ORDER BY n_docs, domain)` a SQL oracle
    * replays (ASCII domain names; exotic collations out of contract).
    *
    * Scale posture: one corpus-sized partial+final count; the fold
    * runs on the collected |domains|-row table (the same bounded
    * driver-state budget as `temperatureSample`) and the result is a
    * |domains|-row local relation. A NULL domain gets a quota row;
    * `uniMaxSample`'s equi-join never matches it — normalize or drop
    * upstream (the `temperatureQuotas` caveat). */
  def uniMaxQuotas(docs: DataFrame, domain: Column, budget: Long,
                   maxEpochs: Int = 1): DataFrame = {
    require(budget > 0, s"uniMaxQuotas: budget=$budget")
    require(maxEpochs >= 1, s"uniMaxQuotas: maxEpochs=$maxEpochs")
    val spark = docs.sparkSession
    val counts = docs.groupBy(domain.as("domain"))
      .agg(count(lit(1)).as("n_docs"))
    // typed tiebreak: a SQL `ORDER BY n_docs, domain` compares numeric
    // domains numerically — String.valueOf would put 10 before 2 and
    // desync every downstream quota (each step depends on `rem`)
    val sorted = counts.collect().sortWith { (a, b) =>
      if (a.getLong(1) != b.getLong(1)) a.getLong(1) < b.getLong(1)
      else (a.isNullAt(0), b.isNullAt(0)) match {
        case (true, _) => false // nulls last, like SQL ASC
        case (_, true) => true
        case _ => (a.get(0), b.get(0)) match {
          case (x: java.lang.Number, y: java.lang.Number)
              if isNonFinite(x) || isNonFinite(y) =>
            // BigDecimal(NaN/Infinity.toString) throws; compare like
            // Spark's sort order (NaN greatest, then +Inf) instead.
            // Transitive with the BigDecimal branch: every finite value
            // compares below +Inf/NaN under Double.compare too.
            java.lang.Double.compare(x.doubleValue, y.doubleValue) < 0
          case (x: java.lang.Number, y: java.lang.Number) =>
            new java.math.BigDecimal(x.toString)
              .compareTo(new java.math.BigDecimal(y.toString)) < 0
          case (x, y) =>
            String.valueOf(x).compareTo(String.valueOf(y)) < 0
        }
      }
    }
    var rem = budget
    val n = sorted.length
    val out = new Array[org.apache.spark.sql.Row](n)
    var i = 0
    while (i < n) {
      val cd = sorted(i).getLong(1)
      val q = math.min(cd * maxEpochs, rem / (n - i))
      rem -= q
      out(i) = org.apache.spark.sql.Row(sorted(i).get(0), cd, q)
      i += 1
    }
    spark.createDataFrame(java.util.Arrays.asList(out: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("domain",
          counts.schema("domain").dataType, nullable = true),
        org.apache.spark.sql.types.StructField("n_docs",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("quota",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** The selected rows under UniMax quotas — the same deterministic
    * `(md5(id), id)` rank fill as `temperatureSample`. */
  def uniMaxSample(docs: DataFrame, id: Column, domain: Column,
                   budget: Long, maxEpochs: Int = 1): DataFrame =
    rankFill(docs, id, domain, uniMaxQuotas(docs, domain, budget,
      maxEpochs))

  /** Fill per-domain quotas with the deterministic md5-rank draw. The
    * quota table is collected ONCE (|domains| rows): max(quota) and
    * the broadcast join side are both rebuilt from the collected rows,
    * so the count aggregate behind the quotas runs a single time, and
    * the `rk <= max(quota)` LITERAL lets WindowGroupLimit plan a
    * partial per-partition top-k BEFORE the domain exchange (a
    * quota-column comparison from a join defeats it). */
  private def rankFill(docs: DataFrame, id: Column, domain: Column,
                       quotaTbl: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val sel = quotaTbl.select(col("domain"), col("quota"))
    val quotaRows = sel.collect()
    val quotas = spark.createDataFrame(
      java.util.Arrays.asList(quotaRows: _*), sel.schema)
    val maxQ =
      if (quotaRows.isEmpty) 0L else quotaRows.map(_.getLong(1)).max
    val idName = docs.select(id).columns.head
    val ranked = docs
      .select(id.as(idName), domain.as("domain"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("domain")
          .orderBy(md5(col(idName).cast("string")), col(idName))))
    ranked
      .where(col("rk") <= lit(maxQ))
      .join(broadcast(quotas), Seq("domain"))
      .where(col("rk") <= col("quota"))
      .select(col(idName), col("domain"), col("rk"))
  }
}
