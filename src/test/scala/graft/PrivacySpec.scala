package graft

import org.apache.spark.sql.functions._
import graft.operators.Privacy

/** k-anonymity / l-diversity audit: hand-computable classes, NULL
  * semantics (QI NULL groups as a value; NULL sensitive never counts
  * toward diversity), and the summary rollup. */
class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  private val rel = Seq(
    // class (a, 1): 3 rows, 2 sensitive values -> k_risky at k=5
    ("a", 1, Option("flu")), ("a", 1, Option("flu")),
    ("a", 1, Option("cold")),
    // class (a, 2): 5 rows, ONE sensitive value -> l_risky only
    ("a", 2, Option("flu")), ("a", 2, Option("flu")),
    ("a", 2, Option("flu")), ("a", 2, Option("flu")),
    ("a", 2, Option("flu")),
    // class (NULL, 1): QI null is a VALUE; all-null sensitive ->
    // diversity 0, l_risky (and k_risky at 2 rows)
    (null, 1, Option.empty[String]), (null, 1, Option.empty[String])
  ).toDF("seg", "region", "diag")

  test("kAnonymityAudit: class sizes, diversity, and flags; NULL QI " +
    "groups; NULL sensitive excluded from diversity") {
    val out = Privacy.kAnonymityAudit(rel,
        Seq(col("seg"), col("region")), col("diag"), k = 5L, l = 2L)
      .orderBy(col("seg").asc_nulls_first, col("region"))
      .collect()
    assert(out.length === 3)
    val byKey = out.map(r => (Option(r.getString(0)), r.getInt(1)) ->
      (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    assert(byKey((Some("a"), 1)) === ((3L, 2L, true, false)))
    assert(byKey((Some("a"), 2)) === ((5L, 1L, false, true)))
    assert(byKey((None, 1)) === ((2L, 0L, true, true)))
    assertThrows[IllegalArgumentException] {
      Privacy.kAnonymityAudit(rel, Nil, col("diag"), 5L, 2L)
    }
    assertThrows[IllegalArgumentException] {
      Privacy.kAnonymityAudit(rel, Seq(col("seg")), col("diag"), 1L, 2L)
    }
  }

  test("kAnonymitySummary rolls the audit up to the release decision") {
    val s = Privacy.kAnonymitySummary(rel,
        Seq(col("seg"), col("region")), col("diag"), k = 5L, l = 2L)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // 3 classes, 10 rows; 2 classes (5 rows) below k; 2 below l;
    // smallest class has 2 rows
    assert(s === ((3L, 10L, 2L, 5L, 2L, 2L)))
  }

  test("audit is one partial+final aggregate pair — no window, no sort, " +
    "no join") {
    val plan = Privacy.kAnonymityAudit(rel,
        Seq(col("seg"), col("region")), col("diag"), 5L, 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin"), plan)
  }
}
