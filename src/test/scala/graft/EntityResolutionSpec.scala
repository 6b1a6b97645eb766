package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityResolution

class EntityResolutionSpec extends SparkTestBase {
  import spark.implicits._

  // prefix blocking for the block-guard test; the matching tests use a
  // single block so titled variants (whose prefix changes) stay testable
  private val block: org.apache.spark.sql.Column =>
    org.apache.spark.sql.Column = n => substring(n, 1, 4)
  private val oneBlock: org.apache.spark.sql.Column =>
    org.apache.spark.sql.Column = _ => lit("all")

  test("resolveEntities: variants cluster transitively, distinct names " +
    "stay apart, null/empty names survive as themselves") {
    val recs = Seq(
      (1L, "Jane Doe"), // canonical
      (2L, "jane-doe"), // normalizes identically → dist 0
      (3L, "Dr. Jane Doe"), // +dr → dist 2 from 1, 2
      (4L, "janedo"), // deletion typo → dist 1 from 1; dist 3 from 3:
      //                 the cluster must close TRANSITIVELY through 1
      (5L, "John Smith"), // unrelated — far beyond the gate
      (6L, "janet dorn"), // near-ish, dist 4 → still no match
      (7L, null.asInstanceOf[String]), // null → itself
      (8L, "—") // normalizes to empty → itself
    ).toDF("id", "name")
    val got = EntityResolution.resolveEntities(recs, col("id"),
        col("name"), oneBlock, maxDistNum = 1, maxDistDen = 4)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 7L, 8L -> 8L))
  }

  test("resolveEntities: oversized blocks are excluded from pairing " +
    "deterministically — members resolve as singletons") {
    val crowd = (0L until 10L).map(i => (i, s"aaaa name $i"))
    val pair = Seq(100L -> "bbbb jane doe", 101L -> "bbbb jane does")
    val recs = (crowd ++ pair).toDF("id", "name")
    val got = EntityResolution.resolveEntities(recs, col("id"),
        col("name"), block, maxDistNum = 1, maxDistDen = 4,
        maxBlock = 5)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // the aaaa block (10 > maxBlock=5) pairs nothing even though every
    // member is within distance 1 of another; the bbbb block still links
    assert(got.take(10) === (0L until 10L).map(i => i -> i))
    assert(got.drop(10) === Seq(100L -> 100L, 101L -> 100L))
  }

  test("resolveEntities: the distance gate is integer-exact at the " +
    "boundary (dist*den == maxlen*num admits; one more edit refuses)") {
    // norms: "abcdefgh" (8 chars) vs a 2-edit variant; num/den = 1/4
    // → gate is dist*4 <= 8 ⇔ dist <= 2 exactly
    val recs = Seq((1L, "abcdefgh"), (2L, "abcdefXY"), // dist 2 → match
      (3L, "abcdeQRS") // dist 3 from BOTH (tail chars disjoint, so no
      //                  shift alignment shortens it) → no match
    ).toDF("id", "name")
    val got = EntityResolution.resolveEntities(recs, col("id"),
        col("name"), oneBlock, maxDistNum = 1, maxDistDen = 4)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("resolveEntities: the pair join is keyed on the block — no " +
    "cartesian/nested-loop product anywhere in the plan") {
    val recs = (0L until 50L).map(i => (i, s"name number $i"))
      .toDF("id", "name")
    val r = EntityResolution.resolveEntities(recs, col("id"),
      col("name"), block)
    r.count()
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair join degenerated to a product:\n$plan")
  }

  test("resolveEntities: rejects a non-positive ratio denominator and " +
    "an unpairable maxBlock") {
    val recs = Seq((1L, "a")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      EntityResolution.resolveEntities(recs, col("id"), col("name"),
        block, maxDistNum = 1, maxDistDen = 0)
    }
    intercept[IllegalArgumentException] {
      EntityResolution.resolveEntities(recs, col("id"), col("name"),
        block, maxBlock = 1)
    }
  }
}
