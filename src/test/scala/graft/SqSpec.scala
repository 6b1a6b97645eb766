package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Sq}

class SqSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(0f, 10f, -5f, 2.5f)),
    (2L, Array(1f, 0f, 5f, 2.5f)),     // constant dim 3 (2.5 everywhere)
    (3L, Array(0.5f, 5f, 0f, 2.5f)),
    (4L, Array(0.25f, 2.5f, -2.5f, 2.5f))
  ).toDF("vec_id", "embedding")

  test("codes hit the range endpoints exactly, constant dims code 0, and " +
    "reconstruction error is bounded by scale/510 per element") {
    val p = Sq.sqTrain(vecs)
    assert(p.dim === 4)
    val codes = Sq.encoded(vecs, p).orderBy("vec_id")
      .as[(Long, Seq[Int])].collect().map(r => r._1 -> r._2).toMap
    // min -> 0, max -> 255 in every non-constant dim
    assert(codes(1L)(1) === 255 && codes(2L)(1) === 0)   // dim 1: 0..10
    assert(codes(1L)(2) === 0 && codes(2L)(2) === 255)   // dim 2: -5..5
    codes.values.foreach(cs => assert(cs(3) === 0))      // constant dim
    codes.values.flatten.foreach(c => assert(c >= 0 && c <= 255))
    val rec = Sq.reconstructed(Sq.encoded(vecs, p), p).orderBy("vec_id")
      .as[(Long, Seq[Float])].collect().map(r => r._1 -> r._2).toMap
    val raw = vecs.orderBy("vec_id")
      .as[(Long, Seq[Float])].collect().map(r => r._1 -> r._2).toMap
    raw.foreach { case (id, v) =>
      v.indices.foreach { i =>
        val scale = p.maxs(i) - p.mins(i)
        val tol = if (scale == 0.0) 1e-6 else scale / 510.0 + 1e-6
        assert(math.abs(rec(id)(i) - v(i)) <= tol,
          s"vec $id dim $i: ${rec(id)(i)} vs ${v(i)} (tol $tol)")
      }
    }
  }

  test("sqTopK ranks like brute force on well-separated vectors and " +
    "excludes degenerate rows from the coded corpus") {
    val p = Sq.sqTrain(vecs)
    val sq = Sq.sqTopK(vecs, vecs, k = 2, p)
      .select("probe_id", "rank", "nbr_id").orderBy("probe_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val brute = Similarity.bruteForceTopK(vecs, vecs, k = 2)
      .select("probe_id", "rank", "nbr_id").orderBy("probe_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(sq.toSeq === brute.toSeq)

    val mixed = vecs.unionByName(Seq(
      (9L, null.asInstanceOf[Array[Float]]),
      (10L, Array(1f, 2f))).toDF("vec_id", "embedding"))
    val enc = Sq.encoded(mixed, p).select("vec_id").as[Long].collect()
    assert(enc.sorted.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("out-of-range batch values clamp instead of overflowing the code " +
    "range (new data quantized under persisted corpus params)") {
    val p = Sq.sqTrain(vecs)
    val batch = Seq((100L, Array(-99f, 99f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val codes = Sq.encoded(batch, p).as[(Long, Seq[Int])].head()._2
    assert(codes(0) === 0)    // below min
    assert(codes(1) === 255)  // above max
  }
}
