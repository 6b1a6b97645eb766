package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bq, Similarity}

class BqSpec extends SparkTestBase {
  import spark.implicits._

  test("encoded packs sign bits MSB-first, 32 dims per word, short tail " +
    "zero-padded") {
    // 3 dims (+,-,+): bits [1,0,1] -> 2^31 + 2^29
    val one = Seq((1L, Array(0.5f, -0.5f, 0f))).toDF("vec_id", "embedding")
    val w3 = Bq.encoded(one, dim = 3).select("words").as[Seq[Long]].head()
    assert(w3 === Seq((1L << 31) + (1L << 29))) // 0f counts as >= 0
    // 33 dims, all non-negative: word0 = 2^32 - 1, word1 = MSB of 32
    val ones = Seq((2L, Array.fill(33)(1f))).toDF("vec_id", "embedding")
    val w33 = Bq.encoded(ones, dim = 33).select("words").as[Seq[Long]]
      .head()
    assert(w33 === Seq((1L << 32) - 1, 1L << 31))
    // wrong-dim rows are excluded (the Sq wellFormedDim contract)
    assert(Bq.encoded(one, dim = 5).count() === 0)
  }

  test("hammingTopK: rerank >= corpus degenerates to exact brute force; " +
    "an exact duplicate probe finds its twin at hamming 0") {
    val vecs = Seq(
      (1L, Array(1f, 0.2f, -0.3f, 0.7f)),
      (2L, Array(1f, 0.2f, -0.3f, 0.7f)),   // exact twin of 1
      (3L, Array(-1f, 0.4f, 0.5f, -0.2f)),
      (4L, Array(0.1f, -0.9f, 0.8f, 0.3f)),
      (5L, Array(-0.5f, -0.5f, -0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val bq = Bq.hammingTopK(vecs, vecs.where(col("vec_id") === 1), k = 4,
        rerank = 5)
      .orderBy("rank")
      .select("nbr_id", "hamming").as[(Long, Long)].collect()
    val brute = Similarity.bruteForceTopK(vecs,
        vecs.where(col("vec_id") === 1), k = 4)
      .orderBy("rank").select("nbr_id").as[Long].collect()
    assert(bq.map(_._1).toSeq === brute.toSeq) // degenerate-exact
    assert(bq.head === ((2L, 0L)))             // twin: hamming 0, top-1
    intercept[IllegalArgumentException] {
      Bq.hammingTopK(vecs, vecs, k = 5, rerank = 3) // rerank < k
    }
  }

  test("persisted BQ index: probe equals the in-query search, corpus " +
    "never re-encoded") {
    val vecs = Seq(
      (1L, Array(1f, 0.2f, -0.3f, 0.7f)),
      (3L, Array(-1f, 0.4f, 0.5f, -0.2f)),
      (4L, Array(0.1f, -0.9f, 0.8f, 0.3f)),
      (5L, Array(-0.5f, -0.5f, -0.5f, 0.5f)),
      (7L, Array(0.9f, 0.1f, -0.2f, 0.6f))
    ).toDF("vec_id", "embedding")
    val batch = Seq((100L, Array(1f, 0.1f, -0.2f, 0.8f)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bq_idx").toString
    Bq.persistBqIndex(vecs, dir)
    val probed = Bq.probeBqIndex(batch, dir, vecs, k = 3, rerank = 4)
      .select("probe_id", "rank", "nbr_id").as[(Long, Int, Long)]
      .collect().toSeq
    val inQuery = Bq.hammingTopK(vecs.unionByName(batch), batch, k = 3,
        rerank = 4)
      .select("probe_id", "rank", "nbr_id").as[(Long, Int, Long)]
      .collect().toSeq
    assert(probed === inQuery)
    // dim is pinned in meta: a batch of another dim yields no probes
    val bad = Seq((200L, Array(1f, 2f))).toDF("vec_id", "embedding")
    assert(Bq.probeBqIndex(bad, dir, vecs, k = 1, rerank = 1).count() === 0)
  }

  test("differential: packing and Hamming agree with a driver-side " +
    "reference on 60 seeded random vectors across dims 1..70") {
    val rnd = new scala.util.Random(20260813L)
    // odd dims straddle word boundaries; values include exact zeros
    val dims = Seq(1, 31, 32, 33, 64, 70)
    dims.foreach { dim =>
      val vs = (0 until 10).map { i =>
        (i.toLong, Array.fill(dim)(rnd.nextInt(5) match {
          case 0 => 0f
          case _ => (rnd.nextFloat() - 0.5f)
        }))
      }
      def refWords(a: Array[Float]): Seq[Long] =
        (0 until (dim + 31) / 32).map { w =>
          (0 until 32).foldLeft(0L) { (acc, j) =>
            acc * 2 + (if (w * 32 + j < dim && a(w * 32 + j) >= 0) 1L
                       else 0L)
          }
        }
      val df = vs.toDF("vec_id", "embedding")
      val got = Bq.encoded(df, dim).orderBy("vec_id")
        .select("words").as[Seq[Long]].collect()
      vs.zip(got).foreach { case ((_, a), w) =>
        assert(w === refWords(a), s"dim=$dim packing diverged")
      }
      // hamming(a, b) == number of sign-disagreeing dimensions
      val pairs = for (i <- vs.indices; j <- vs.indices if i < j) yield {
        val (da, db) = (vs(i)._2, vs(j)._2)
        (i, j) -> da.indices.count(x => (da(x) >= 0) != (db(x) >= 0))
      }
      val enc = Bq.encoded(df, dim)
      val ham = enc.as("a").join(enc.as("b"),
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"),
          Bq.hamming(col("a.words"), col("b.words")))
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1.toInt, r._2.toInt) -> r._3).toMap
      pairs.foreach { case (k, expect) =>
        assert(ham(k) === expect.toLong, s"dim=$dim hamming diverged at $k")
      }
    }
  }
}
