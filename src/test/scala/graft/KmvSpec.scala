package graft

import org.apache.spark.sql.functions._
import graft.operators.Kmv

class KmvSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (String, String)*) =
    rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")

  test("k >= union size degenerates to exact: estimate equals the true " +
    "jaccard, k_used = union cardinality") {
    // A = {a b c d}, B = {c d e f}: inter 2, union 6, J = 1/3
    val d = docs(("A", "a b c d"), ("B", "c d e f"))
    val got = Kmv.sourceOverlap(d, col("source"), col("text"), k = 64)
      .head()
    assert(got.getString(0) === "A" && got.getString(1) === "B")
    assert(got.getLong(2) === 6L)            // k_used = |union|
    assert(got.getLong(3) === 2L)            // n_inter in sketch
    assert(got.getDouble(4) === 2.0 / 6.0)   // est == exact here
    assert(got.getLong(5) === 2L && got.getLong(6) === 6L)
    assert(got.getDouble(7) === 2.0 / 6.0)
  }

  test("bottom-k estimate matches the driver replay of the same md5 " +
    "ranks; disjoint sources estimate 0; layout-free") {
    val va = (1 to 300).map(i => s"wa$i")
    val vb = (1 to 300).map(i => s"wb$i") // disjoint
    val vc = (1 to 300).map(i => if (i <= 150) s"wa$i" else s"wc$i")
    val d = docs(("A", va.mkString(" ")), ("B", vb.mkString(" ")),
      ("C", vc.mkString(" ")))
    val k = 32
    for (parts <- Seq(1, 5)) {
      val got = Kmv.sourceOverlap(d.repartition(parts), col("source"),
          col("text"), k)
        .orderBy("src_a", "src_b").collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4))))
        .toMap
      assert(got(("A", "B"))._2 === 0L) // disjoint → sketch inter 0
      // driver replay for (A, C)
      def md5hex(s: String) = java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      def sig(v: Seq[String]) =
        v.distinct.map(t => (md5hex(t), t)).sorted.take(k)
      val sa = sig(va).toSet
      val sc = sig(vc).toSet
      val union = (sa ++ sc).toSeq.sorted.take(k)
      val inter = union.count(x => sa.contains(x) && sc.contains(x))
      val (kUsed, nInter, est) = got(("A", "C"))
      assert(kUsed === union.length.toLong && nInter === inter.toLong)
      assert(est === inter.toDouble / union.length)
    }
  }
}
