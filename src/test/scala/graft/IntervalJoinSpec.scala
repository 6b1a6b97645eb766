package graft

import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

/** Grid-bucketed interval overlap join: exactness vs the naive overlap
  * predicate (the thing it replaces), exactly-once pair emission with
  * no distinct pass, negative-coordinate bucketing, equi-key scoping,
  * and the plan guard that the join actually runs as an equi-join (no
  * BroadcastNestedLoopJoin / cartesian fallback). */
class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(a: Seq[(Long, Long, Long)],
                    b: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (ai, as_, ae) <- a; (bi, bs, be) <- b
      if as_ <= be && bs <= ae
    } yield (ai, bi)).toSet

  test("overlapJoin differential property: matches the naive overlap " +
    "predicate exactly, each pair exactly once, across bucket widths " +
    "and negative coordinates") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val iv = for {
      s <- Gen.choose(-40L, 40L)
      len <- Gen.choose(0L, 25L)
    } yield (s, s + len)
    val gen = for {
      na <- Gen.choose(0, 12); nb <- Gen.choose(0, 12)
      a <- Gen.listOfN(na, iv); b <- Gen.listOfN(nb, iv)
      w <- Gen.oneOf(1L, 3L, 7L, 100L)
    } yield (a.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) },
      b.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }, w)
    val prop = Prop.forAll(gen) { case (a, b, w) =>
      val adf = a.toDF("a_id", "a_s", "a_e")
      val bdf = b.toDF("b_id", "b_s", "b_e")
      val got = IntervalJoin.overlapJoin(adf, bdf, "a_s", "a_e",
          "b_s", "b_e", bucketWidth = w)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      // exactly-once: the bag has no duplicates AND the set matches
      got.length == got.toSet.size && got.toSet == naive(a, b)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("overlapJoin with equiKeys only pairs intervals sharing the key; " +
    "null / inverted intervals never match") {
    val a = Seq((1L, "u1", 0L, 10L), (2L, "u2", 0L, 10L),
      (3L, "u1", 5L, 4L),                       // inverted: dropped
      (4L, "u1", 20L, 30L))
      .toDF("a_id", "k", "a_s", "a_e")
    val b = Seq((10L, "u1", 5L, 6L), (11L, "u2", 100L, 110L),
      (12L, "u3", 0L, 100L), (13L, "u1", 25L, 25L))
      .toDF("b_id", "k", "b_s", "b_e")
    val got = IntervalJoin.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e",
        bucketWidth = 7L, equiKeys = Seq("k"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (4L, 13L)))
    // equiKeys column is emitted once, from the left side
    val cols = IntervalJoin.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e",
      bucketWidth = 7L, equiKeys = Seq("k")).columns.toSeq
    assert(cols === Seq("a_id", "k", "a_s", "a_e", "b_id", "b_s", "b_e"))
  }

  test("overlapJoin plans as an equi-join: no BroadcastNestedLoopJoin, " +
    "no CartesianProduct, grid cell in the join key") {
    val a = (0L until 50L).map(i => (i, i * 3, i * 3 + 5))
      .toDF("a_id", "a_s", "a_e")
    val b = (0L until 50L).map(i => (i, i * 2, i * 2 + 4))
      .toDF("b_id", "b_s", "b_e")
    val out = IntervalJoin.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e",
      bucketWidth = 7L)
    out.collect() // force the adaptive plan final
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the naive predicate alone DOES nested-loop (what we're avoiding)
    val naivePlan = a.join(b,
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .queryExecution.sparkPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"), naivePlan)
  }

  test("overlapJoin rejects clashing non-key columns and reserved names") {
    val a = Seq((1L, 0L, 1L)).toDF("x", "a_s", "a_e")
    val b = Seq((1L, 0L, 1L)).toDF("x", "b_s", "b_e")
    assertThrows[IllegalArgumentException] {
      IntervalJoin.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", 7L)
    }
    val c = Seq((1L, 0L, 1L)).toDF("__cell", "b_s", "b_e")
    assertThrows[IllegalArgumentException] {
      IntervalJoin.overlapJoin(a.withColumnRenamed("x", "ax"), c,
        "a_s", "a_e", "b_s", "b_e", 7L)
    }
  }
}
