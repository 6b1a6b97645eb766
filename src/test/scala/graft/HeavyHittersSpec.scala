package graft

import org.apache.spark.sql.functions._
import graft.functions.SketchAggregates
import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int = 4) =
    items.toDF("x").repartition(parts)
      .agg(SketchAggregates.misraGries(col("x"), k).as("sk"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1))

  test("misraGries: k >= distinct degenerates to exact counts, " +
    "count-desc presentation, nulls skipped") {
    val items = Seq("a", "a", "a", "b", "b", "c", null, null)
    val got = sketch(items.map(identity), k = 10)
    assert(got === Seq("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("misraGries: lower-bound, undercount <= N/(k+1), and completeness " +
    "for true heavies — under adversarial order AND any partitioning") {
    // 100 x "hot", 50 x "warm", 200 distinct singletons; N = 350
    val items = (1 to 100).map(_ => "hot") ++ (1 to 50).map(_ => "warm") ++
      (1 to 200).map(i => s"cold$i")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (order <- Seq(items, items.reverse,
           new scala.util.Random(7).shuffle(items));
         parts <- Seq(1, 4, 32)) {
      val k = 20
      val got = sketch(order, k, parts).toMap
      val bound = items.size.toDouble / (k + 1)
      got.foreach { case (item, lb) =>
        assert(lb <= exact(item), s"$item overcounted: $lb")
        assert(exact(item) - lb <= bound,
          s"$item undercount ${exact(item) - lb} > $bound")
      }
      // completeness: every item with true count > N/(k+1) must survive
      exact.filter(_._2 > bound).keys.foreach { h =>
        assert(got.contains(h), s"heavy $h evicted (parts=$parts)")
      }
      assert(got.size <= k)
    }
  }

  test("exactHeavyHitters: output equals the exact groupBy answer and is " +
    "partitioning-invariant") {
    val items = (1 to 100).map(_ => "hot") ++ (1 to 30).map(_ => "warm") ++
      (1 to 170).map(i => s"cold${i % 85}") // 85 items x 2
    // N = 300; minShare 0.1 -> threshold 30: {hot=100, warm=30}
    for (parts <- Seq(1, 32)) {
      val df = items.toDF("x").repartition(parts)
      val got = HeavyHitters.exactHeavyHitters(df, col("x"),
          minShare = 0.1, k = 20)
        .orderBy(desc("n_item"))
        .select("item", "n_item", "n_total", "threshold")
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got === Seq(("hot", 100L, 300L, 30L),
        ("warm", 30L, 300L, 30L)))
    }
  }

  test("exactHeavyHitters: guard refuses a k too small for the share; " +
    "empty input yields empty output") {
    intercept[IllegalArgumentException] {
      HeavyHitters.exactHeavyHitters(Seq("a").toDF("x"), col("x"),
        minShare = 0.001, k = 100)
    }
    assert(HeavyHitters.exactHeavyHitters(
      Seq.empty[String].toDF("x"), col("x"), minShare = 0.5, k = 10)
      .count() === 0)
  }

  private def cmsSketch(items: Seq[String], depth: Int, parts: Int) =
    items.toDF("x").repartition(parts)
      .agg(SketchAggregates.countMin(col("x"), depth).as("sk"))
      .head().getSeq[Long](0)

  test("countMin: never underestimates, exact when collision-free, " +
    "nulls skipped, and the column-side bucket matches the aggregate's") {
    val items = (1 to 7).flatMap(i => Seq.fill(i)(s"item$i")) ++
      Seq(null, null)
    val sk = cmsSketch(items.map(x => x: String), depth = 3, parts = 3)
    assert(sk.length === 3 * 4096)
    assert(sk.sum === 3L * 28) // each non-null lands once per depth row
    // read estimates back through the RELATIONAL bucket — parity with
    // the aggregate's internal hash is what the battery query relies on
    val est = (1 to 7).map { i =>
      val buckets = Seq("item" + i).toDF("x").select(
        (0 until 3).map(d =>
          SketchAggregates.countMinBucket(d, col("x")).as(s"b$d")): _*)
        .head()
      (0 until 3).map(d => sk(d * 4096 + buckets.getInt(d))).min
    }
    // 7 items in 4096 buckets: collision-free here → estimates exact
    assert(est === (1 to 7).map(_.toLong))
  }

  test("countMin: merge is elementwise add — the sketch is identical " +
    "under any partitioning (the order-independence the oracle needs)") {
    val items = (1 to 500).map(i => s"w${i % 37}")
    val a = cmsSketch(items, depth = 2, parts = 1)
    val b = cmsSketch(items, depth = 2, parts = 7)
    assert(a === b)
  }

  test("countMin: rejects out-of-range depth") {
    intercept[IllegalArgumentException] {
      graft.functions.CountMinAgg(null, depth = 0)
    }
    intercept[IllegalArgumentException] {
      graft.functions.CountMinAgg(null, depth = 17)
    }
  }

  private def dyadicSketch(vals: Seq[Long], levels: Int, depth: Int,
                           parts: Int) =
    vals.toDF("v").repartition(parts)
      .agg(SketchAggregates.dyadicCountMin(col("v"), levels, depth)
        .as("sk"))
      .head().getSeq[Long](0)

  test("dyadicCountMin: ranks never underestimate and are exact on a " +
    "collision-free set; decomposition covers [0, x] exactly; quantile " +
    "binary search lands the exact quantile when ranks are exact") {
    // 0..999 once each, levels = 10 covers [0, 1024)
    val vals = (0L until 1000L)
    val sk = dyadicSketch(vals, levels = 10, depth = 3, parts = 4)
    assert(sk.length === 10 * 3 * 4096)
    // decomposition sanity: node widths sum to x+1 for assorted x
    for (x <- Seq(0L, 1L, 5L, 127L, 511L, 999L, 1023L)) {
      val covered = SketchAggregates.dyadicNodes(x, 10)
        .map { case (l, _) => 1L << l }.sum
      assert(covered === x + 1, s"x=$x")
    }
    // exact ranks (1000 prefixes per level in 4096 buckets x 3 rows:
    // a triple-collision on every probed node is required to overcount
    // — deterministic; these values pass, so they always pass)
    for (x <- Seq(0L, 499L, 999L))
      assert(SketchAggregates.dyadicRank(sk.toIndexedSeq, 10, 3, x)
        === x + 1)
    // below-domain and above-data ranks
    assert(SketchAggregates.dyadicRank(sk.toIndexedSeq, 10, 3, -1L) === 0L)
    assert(SketchAggregates.dyadicRank(sk.toIndexedSeq, 10, 3, 1023L)
      === 1000L)
    // quantiles: ceil(q*1000)-th value of 0..999 is ceil(q*1000)-1
    for (q <- Seq(0.25, 0.5, 0.9, 1.0))
      assert(SketchAggregates.dyadicQuantile(sk.toIndexedSeq, 10, 3,
        n = 1000L, q = q) === math.ceil(q * 1000).toLong - 1)
  }

  test("dyadicCountMin: sum of disjoint partials equals the union's " +
    "sketch (the rolling/serving contract), and ranks over the sum " +
    "answer the union") {
    val a = (0L until 300L)
    val b = (300L until 500L)
    val skA = dyadicSketch(a, levels = 9, depth = 3, parts = 2)
    val skB = dyadicSketch(b, levels = 9, depth = 3, parts = 3)
    val skU = dyadicSketch(a ++ b, levels = 9, depth = 3, parts = 4)
    val summed = skA.zip(skB).map { case (x, y) => x + y }
    assert(summed === skU)
    assert(SketchAggregates.dyadicRank(summed.toIndexedSeq, 9, 3, 249L)
      === 250L)
    assert(SketchAggregates.dyadicQuantile(summed.toIndexedSeq, 9, 3,
      n = 500L, q = 0.5) === 249L)
  }

  test("dyadicCountMin: merge is elementwise add — identical sketch " +
    "under any partitioning; out-of-domain values fail the job") {
    val vals = (1 to 400).map(i => (i % 61).toLong)
    val a = dyadicSketch(vals, levels = 6, depth = 2, parts = 1)
    val b = dyadicSketch(vals, levels = 6, depth = 2, parts = 8)
    assert(a === b)
    val ex = intercept[Exception] {
      dyadicSketch(Seq(64L), levels = 6, depth = 2, parts = 1)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("outside [0, 2^6)")), ex.toString)
    intercept[Exception] {
      dyadicSketch(Seq(-1L), levels = 6, depth = 2, parts = 1)
    }
  }

  test("exactHeavyHitters accepts a non-string item column (numeric ids " +
    "cast through the sketch and the verify pass identically)") {
    val df = ((1 to 90).map(_ => 7L) ++ (1 to 10).map(_ => 9L))
      .toDF("user_id")
    val hh = HeavyHitters.exactHeavyHitters(df, col("user_id"),
        minShare = 0.5, k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(hh === Map("7" -> 90L))
  }
}
