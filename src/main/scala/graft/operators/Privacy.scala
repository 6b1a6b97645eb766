package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification risk audits for training-data release — the
  * measurement side of the PII tier (TextAnalysis.piiScan finds direct
  * identifiers; this measures what the RESIDUAL quasi-identifiers still
  * leak): k-anonymity (Sweeney 2002 — every quasi-identifier
  * combination must be shared by ≥ k rows) and l-diversity (Machanavajjhala
  * et al. 2007 — every combination must carry ≥ l distinct sensitive
  * values, or a k-anonymous group still discloses its one sensitive
  * value to anyone who can place a person in it).
  *
  * Both are pure relational aggregates — exact integers end to end, no
  * float discipline needed — and partial-aggregable: ONE hash aggregate
  * over the quasi-identifier key (count + exact distinct), so the audit
  * costs a groupBy of the release candidate no matter the corpus size.
  * Exact countDistinct plans one Expand (×2 rows); at 100 TB an
  * approx_count_distinct l-screen can pre-filter, but the RELEASE
  * decision needs the exact count — the profileColumns trade-off,
  * resolved the same way.
  */
object Privacy {

  /** Per-equivalence-class audit: one row per distinct quasi-identifier
    * combination with its size, sensitive diversity, and risk flags.
    *
    * NULL handling: a NULL in a quasi-identifier is a VALUE (groups
    * with others of the same shape — Spark/DuckDB GROUP BY semantics
    * agree); NULL sensitive values do not count toward diversity
    * (count(DISTINCT) skips them), so an all-NULL-sensitive group has
    * diversity 0 and always flags `l_risky`.
    *
    * Output: (qi..., n_rows, n_sensitive, k_risky, l_risky), where
    * k_risky ⇔ n_rows < k and l_risky ⇔ n_sensitive < l.
    */
  def kAnonymityAudit(df: DataFrame, qi: Seq[Column], sensitive: Column,
                      k: Long, l: Long): DataFrame = {
    require(qi.nonEmpty, "kAnonymityAudit: need at least one " +
      "quasi-identifier column")
    require(k >= 2, s"kAnonymityAudit: k=$k must be >= 2")
    require(l >= 1, s"kAnonymityAudit: l=$l must be >= 1")
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(sensitive).as("n_sensitive"))
      .select(col("*"),
        (col("n_rows") < k).as("k_risky"),
        (col("n_sensitive") < l).as("l_risky"))
  }

  /** The release-gate rollup of [[kAnonymityAudit]]: one row with the
    * class/row totals a publish decision compares against policy —
    * total classes, classes (and rows) below k, classes below l, and
    * the minimum class size (the release's actual k). */
  def kAnonymitySummary(df: DataFrame, qi: Seq[Column], sensitive: Column,
                        k: Long, l: Long): DataFrame =
    kAnonymityAudit(df, qi, sensitive, k, l)
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n_rows")).as("n_rows"),
        sum(when(col("k_risky"), 1L).otherwise(0L)).as("k_risky_classes"),
        sum(when(col("k_risky"), col("n_rows")).otherwise(0L))
          .as("k_risky_rows"),
        sum(when(col("l_risky"), 1L).otherwise(0L)).as("l_risky_classes"),
        min(col("n_rows")).as("min_class_size"))
}
