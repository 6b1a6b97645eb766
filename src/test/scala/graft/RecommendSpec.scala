package graft

import org.apache.spark.sql.functions._
import graft.operators.Recommend

class RecommendSpec extends SparkTestBase {
  import spark.implicits._

  // baskets: 1={A,B,C}, 2={A,B}, 3={A,D}, 4={B,C} — items as longs
  // (A=10, B=20, C=30, D=40). Marginals: A=3, B=3, C=2, D=1.
  // Pairs: AB cooc=2, AC=1, BC=2, AD=1.
  private def memberships =
    Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L),
        (3L, 10L), (3L, 40L), (4L, 20L), (4L, 30L))
      .toDF("b", "i")

  test("itemSimilarity: hand-computed cooc counts, kept-set marginals, " +
    "cosine = cooc/sqrt(n1*n2), duplicate memberships collapse") {
    val dup = memberships.union(Seq((1L, 10L)).toDF("b", "i"))
    val got = Recommend.itemSimilarity(dup, col("b"), col("i"))
      .select("i1", "i2", "n_cooc", "n_i1", "n_i2", "cosine",
        "n_dropped_baskets")
      .as[(Long, Long, Long, Long, Long, Double, Long)]
      .collect().toSet
    val exp = Set(
      (10L, 20L, 2L, 3L, 3L, 2.0 / math.sqrt(9.0), 0L),
      (10L, 30L, 1L, 3L, 2L, 1.0 / math.sqrt(6.0), 0L),
      (20L, 30L, 2L, 3L, 2L, 2.0 / math.sqrt(6.0), 0L),
      (10L, 40L, 1L, 3L, 1L, 1.0 / math.sqrt(3.0), 0L))
    assert(got === exp)
  }

  test("itemSimilarity: an oversized basket is excluded from pairs AND " +
    "marginals, and counted in n_dropped_baskets") {
    // basket 9 holds A,B,C,D,E (5 items) — over the cap of 4
    val big = memberships.union(
      Seq((9L, 10L), (9L, 20L), (9L, 30L), (9L, 40L), (9L, 50L))
        .toDF("b", "i"))
    val got = Recommend.itemSimilarity(big, col("b"), col("i"),
        maxBasketSize = 4L)
      .select("i1", "i2", "n_cooc", "n_i1", "n_i2", "n_dropped_baskets")
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    // identical to the base case (marginals unchanged) + dropped=1
    val exp = Set(
      (10L, 20L, 2L, 3L, 3L, 1L), (10L, 30L, 1L, 3L, 2L, 1L),
      (20L, 30L, 2L, 3L, 2L, 1L), (10L, 40L, 1L, 3L, 1L, 1L))
    assert(got === exp)
  }

  test("itemSimilarity: minCooc prunes pairs after exact aggregation") {
    val got = Recommend.itemSimilarity(memberships, col("b"), col("i"),
        minCooc = 2L)
      .select("i1", "i2").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 20L), (20L, 30L)))
  }

  test("topNeighbors: mirrored pairs, deterministic (cosine, n_cooc, nbr) " +
    "rank, k cuts per item") {
    val sims = Recommend.itemSimilarity(memberships, col("b"), col("i"))
    val got = Recommend.topNeighbors(sims, k = 2)
      .select("item", "nbr", "rnk").as[(Long, Long, Int)]
      .collect().toSet
    // per-item cosine order:
    //   A: AB=.667 > AD=.577 > AC=.408 → top2 = B, D
    //   B: BC=.816 > AB=.667          → top2 = C, A
    //   C: BC=.816 > AC=.408          → C has 2 nbrs
    //   D: AD=.577                    → 1 nbr
    val exp = Set(
      (10L, 20L, 1), (10L, 40L, 2),
      (20L, 30L, 1), (20L, 10L, 2),
      (30L, 20L, 1), (30L, 10L, 2),
      (40L, 10L, 1))
    assert(got === exp)
  }

  test("recommendForUsers: integer vote sums, owned items anti-joined " +
    "out, per-user k cut") {
    val sims = Recommend.itemSimilarity(memberships, col("b"), col("i"))
    val nbrs = Recommend.topNeighbors(sims, k = 3)
    // user 1 owns {A}; user 2 owns {A, B} (via two baskets)
    val ui = Seq((1L, 10L), (2L, 10L), (2L, 20L)).toDF("u", "i")
    val got = Recommend.recommendForUsers(ui, col("u"), col("i"), nbrs, 5)
      .select("user", "item", "score", "n_links", "rnk")
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    // user 1: A's nbrs = B(2), D(1), C(1) all unseen →
    //   B score 2 rank 1; C/D tie at 1 → C(30) before D(40)
    // user 2: A votes {B:2, D:1, C:1}, B votes {C:2, A:2};
    //   unseen: C 1+2=3 (2 links), D 1 (1 link)
    val exp = Set(
      (1L, 20L, 2L, 1L, 1), (1L, 30L, 1L, 1L, 2), (1L, 40L, 1L, 1L, 3),
      (2L, 30L, 3L, 2L, 1), (2L, 40L, 1L, 1L, 2))
    assert(got === exp)
  }

  test("evalRanking: hand-computed metrics; truth universe includes " +
    "rec-less users as zeros; rank > k ignored; duplicate truth " +
    "collapses") {
    val (disc, idcg) = Recommend.ndcgTables(3)
    // user 1: recs [10@1 miss, 20@2 hit, 30@3 hit, 40@4 ignored(>k)]
    //         truth {20, 30, 40, 50} (40 only reachable at rank 4)
    // user 2: truth {99} but NO recs -> all-zero row
    // user 3: recs [10@1 hit] truth {10, 10 dup} -> n_truth 1, ndcg 1
    val recs = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3),
      (1L, 40L, 4), (3L, 10L, 1)).toDF("u", "i", "r")
    val truth = Seq((1L, 20L), (1L, 30L), (1L, 40L), (1L, 50L),
      (2L, 99L), (3L, 10L), (3L, 10L)).toDF("u", "i")
    val got = Recommend.evalRanking(recs, col("u"), col("i"), col("r"),
        truth, col("u"), col("i"), k = 3)
      .orderBy("user").collect()
    assert(got.length === 3)
    val r1 = got(0)
    assert(r1.getLong(1) === 4L && r1.getLong(2) === 3L &&
      r1.getLong(3) === 2L && r1.getInt(4) === 2)
    assert(r1.getDouble(5) === 0.5)                       // rr = 1/2
    assert(r1.getDouble(6) === 2.0 / 3.0)                 // precision
    assert(r1.getDouble(7) === 0.5)                       // recall 2/4
    assert(r1.getDouble(8) === 0.0 + disc(1) + disc(2))   // asc fold
    assert(r1.getDouble(9) === idcg(2))                   // min(k,4)=3
    assert(r1.getDouble(10) ===
      (0.0 + disc(1) + disc(2)) / idcg(2))
    val r2 = got(1)
    assert(r2.getLong(1) === 1L && r2.getLong(2) === 0L &&
      r2.getLong(3) === 0L && r2.isNullAt(4))
    assert(r2.getDouble(5) === 0.0 && r2.getDouble(8) === 0.0 &&
      r2.getDouble(10) === 0.0)
    val r3 = got(2)
    assert(r3.getLong(1) === 1L && r3.getLong(3) === 1L)
    assert(r3.getDouble(10) === 1.0)                      // perfect
    assertThrows[IllegalArgumentException] {
      Recommend.evalRanking(recs, col("u"), col("i"), col("r"),
        truth, col("u"), col("i"), k = 0)
    }
  }

  test("alsRank1: hand-computed alternating chain at one round; " +
    "duplicate pairs collapse by max; both modes agree on small data") {
    // u1 rates {A:4, B:2}, u2 rates {A:3}; lambda = 0.5, v0 = 1
    val ratings = Seq((1L, 10L, 4L), (1L, 20L, 2L), (2L, 10L, 3L),
      (2L, 10L, 1L))   // dup (2,A) collapses to max = 3
      .toDF("u", "i", "r")
    val got = Recommend.alsRank1(ratings, col("u"), col("i"), col("r"),
        iters = 1, lambda = 0.5, deterministic = true)
      .orderBy("user", "item")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    // replay the exact IEEE chain (ascending-counterpart folds)
    val u1 = (4.0 * 1.0 + 2.0 * 1.0) / (0.5 + (1.0 + 1.0))   // 2.4
    val u2 = (3.0 * 1.0) / (0.5 + 1.0)                        // 2.0
    // item A folds ascending USER id (u1 before u2); two-term IEEE
    // sums are commutative so the order only matters from 3 terms up
    val vA = (4.0 * u1 + 3.0 * u2) / (0.5 + (u1 * u1 + u2 * u2))
    val vB = (2.0 * u1) / (0.5 + u1 * u1)
    assert(got === Seq(
      (1L, 10L, 4L, u1, vA, u1 * vA),
      (1L, 20L, 2L, u1, vB, u1 * vB),
      (2L, 10L, 3L, u2, vA, u2 * vA)))
    // production mode lands on the same factors here (sums of 1-2
    // terms are order-free)
    val prod = Recommend.alsRank1(ratings, col("u"), col("i"), col("r"),
        iters = 1, lambda = 0.5, deterministic = false)
      .orderBy("user", "item")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(prod === got)
    assertThrows[IllegalArgumentException] {
      Recommend.alsRank1(ratings, col("u"), col("i"), col("r"),
        iters = 0, lambda = 0.5)
    }
    assertThrows[IllegalArgumentException] {
      Recommend.alsRank1(ratings, col("u"), col("i"), col("r"),
        iters = 1, lambda = 0.0)
    }
  }

  test("alsRank1 differential: deterministic mode equals an in-memory " +
    "reference fold on random frames, bit for bit") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val nu = 5 + rnd.nextInt(10); val ni = 5 + rnd.nextInt(10)
      val raw = (1 to 60).map(_ => (rnd.nextInt(nu).toLong,
        rnd.nextInt(ni).toLong, (1 + rnd.nextInt(9)).toLong))
      val iters = 1 + rnd.nextInt(3)
      val lambda = 0.5
      val got = Recommend.alsRank1(raw.toDF("u", "i", "r"), col("u"),
          col("i"), col("r"), iters, lambda, deterministic = true)
        .orderBy("user", "item")
        .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
      // reference: same dedup (max per pair), same ascending-
      // counterpart fold, same op order
      val pairs = raw.groupBy(p => (p._1, p._2))
        .map { case ((u, i), xs) => (u, i, xs.map(_._3).max) }.toSeq
      var v = pairs.map(_._2).distinct.map(_ -> 1.0).toMap
      var u = Map.empty[Long, Double]
      for (_ <- 1 to iters) {
        u = pairs.groupBy(_._1).map { case (uk, xs) =>
          val s = xs.sortBy(_._2)
          var num = 0.0; var den = 0.0
          s.foreach { case (_, i, r) =>
            num += r.toDouble * v(i); den += v(i) * v(i) }
          uk -> num / (lambda + den)
        }
        v = pairs.groupBy(_._2).map { case (ik, xs) =>
          val s = xs.sortBy(_._1)
          var num = 0.0; var den = 0.0
          s.foreach { case (uu, _, r) =>
            num += r.toDouble * u(uu); den += u(uu) * u(uu) }
          ik -> num / (lambda + den)
        }
      }
      val exp = pairs.map { case (uk, ik, r) =>
        (uk, ik, r, u(uk), v(ik), u(uk) * v(ik)) }
        .sortBy(p => (p._1, p._2))
      assert(got === exp, s"trial $trial (iters=$iters)")
    }
  }

  test("alsRank2 differential: the 2x2 closed-form solves match an " +
    "in-memory reference bit for bit; rank-2 beats rank-1 on the " +
    "training objective") {
    val rnd = new scala.util.Random(7)
    val raw = (1 to 80).map(_ => (rnd.nextInt(8).toLong,
      rnd.nextInt(8).toLong, (1 + rnd.nextInt(9)).toLong))
    val lambda = 0.5; val iters = 2
    val got = Recommend.alsRank2(raw.toDF("u", "i", "r"), col("u"),
        col("i"), col("r"), iters, lambda, deterministic = true)
      .orderBy("user", "item")
      .as[(Long, Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    val pairs = raw.groupBy(p => (p._1, p._2))
      .map { case ((u, i), xs) => (u, i, xs.map(_._3).max) }.toSeq
    def seed2(i: Long): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(h.substring(0, 2), 16) % 8) + 1)
        .toDouble / 8.0
    }
    var v = pairs.map(_._2).distinct
      .map(i => i -> (1.0, seed2(i))).toMap
    var u = Map.empty[Long, (Double, Double)]
    def solve(grouped: Seq[(Long, Seq[(Long, Long)])],
              f: Long => (Double, Double)): Map[Long, (Double, Double)] =
      grouped.map { case (k, xs) =>
        var b1 = 0.0; var b2 = 0.0
        var s11 = 0.0; var s12 = 0.0; var s22 = 0.0
        xs.sortBy(_._1).foreach { case (o, r) =>
          val (f1, f2) = f(o)
          b1 += r.toDouble * f1; b2 += r.toDouble * f2
          s11 += f1 * f1; s12 += f1 * f2; s22 += f2 * f2
        }
        val det = (lambda + s11) * (lambda + s22) - s12 * s12
        k -> (((lambda + s22) * b1 - s12 * b2) / det,
          ((lambda + s11) * b2 - s12 * b1) / det)
      }.toMap
    for (_ <- 1 to iters) {
      u = solve(pairs.groupBy(_._1).view
        .mapValues(_.map(x => (x._2, x._3))).toSeq, v)
      v = solve(pairs.groupBy(_._2).view
        .mapValues(_.map(x => (x._1, x._3))).toSeq, u)
    }
    val exp = pairs.map { case (uk, ik, r) =>
      val (u1, u2) = u(uk); val (v1, v2) = v(ik)
      (uk, ik, r, u1, u2, v1, v2, u1 * v1 + u2 * v2)
    }.sortBy(p => (p._1, p._2))
    assert(got === exp)
    // more capacity must fit the training ratings at least as well
    val sse2 = got.map(x => math.pow(x._3.toDouble - x._8, 2)).sum
    val r1 = Recommend.alsRank1(raw.toDF("u", "i", "r"), col("u"),
        col("i"), col("r"), iters, lambda, deterministic = true)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    val sse1 = r1.map(x => math.pow(x._3.toDouble - x._6, 2)).sum
    assert(sse2 < sse1, s"rank-2 SSE $sse2 not below rank-1 $sse1")
  }
}
