package graft

import org.apache.spark.sql.functions._
import graft.functions.Retrieval

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  // dl: a=4, b=4, c=2, d=3 → N=4, Σdl=13
  private val docs = Seq(
    (1L, "spark join spark window"),  // spark ×2, join ×1
    (2L, "join join join window"),    // join ×3
    (3L, "filter scan"),              // no query terms
    (4L, "spark filter scan")         // spark ×1
  ).toDF("doc_id", "text")

  private def score(tf: Long, df: Long, dl: Long,
                    n: Long = 4L, sumDl: Long = 13L,
                    k1: Double = 1.2, b: Double = 0.75): Double = {
    val avgdl = sumDl.toDouble / n
    val idf = (n.toDouble - df + 0.5) / (df + 0.5)
    idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
  }

  test("bm25TopK: hand-computed scores, rank order, and zero-match " +
    "exclusion") {
    val r = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
        Seq("spark", "join"), k = 10)
      .orderBy("rank")
      .select("doc_id", "dl", "n_terms", "score", "rank")
      .as[(Long, Int, Long, Double, Int)].collect()
    // doc 3 has no query terms → absent
    assert(r.map(_._1).toSet === Set(1L, 2L, 4L))
    val expected = Map(
      1L -> (score(2, 2, 4) + score(1, 2, 4)), // spark tf=2 + join tf=1
      2L -> score(3, 2, 4),                    // join tf=3
      4L -> score(1, 2, 3))                    // spark tf=1, dl=3
    r.foreach { case (id, _, _, s, _) =>
      assert(math.abs(s - expected(id)) < 1e-12, s"doc $id") }
    // ranks follow (score desc, doc_id asc)
    val byScore = expected.toSeq.sortBy { case (id, s) => (-s, id) }
    assert(r.map(_._1).toSeq === byScore.map(_._1))
    assert(r.map(_._5).toSeq === Seq(1, 2, 3))
    // n_terms counts MATCHED distinct terms
    assert(r.find(_._1 == 1L).get._3 === 2L)
    assert(r.find(_._1 == 2L).get._3 === 1L)
  }

  test("bm25TopK: k truncates through TakeOrderedAndProject and ties " +
    "break toward the lower doc_id") {
    val r = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
        Seq("spark", "join"), k = 2)
      .select("doc_id").as[Long].collect()
    assert(r.length === 2)
    // equal-text docs tie exactly → lower id first
    val dup = Seq((1L, "same text here"), (2L, "same text here"),
      (3L, "same text here")).toDF("doc_id", "text")
    val t = Retrieval.bm25TopK(dup, col("doc_id"), col("text"),
        Seq("same"), k = 2)
      .orderBy("rank").select("doc_id").as[Long].collect()
    assert(t.toSeq === Seq(1L, 2L))
  }

  test("bm25TopK: query casing is normalized and degenerate inputs " +
    "refuse loudly") {
    val r = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
        Seq("SPARK"), k = 5)
      .select("doc_id").as[Long].collect()
    assert(r.toSet === Set(1L, 4L))
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, col("doc_id"), col("text"), Seq(), 5) }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, col("doc_id"), col("text"), Seq("x"), 0) }
  }

  test("rrfFuse: hand-computed fusion, single-list docs fuse at their " +
    "solo contribution, ties break toward the lower id") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val sem = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val r = Retrieval.rrfFuse(Seq("lex" -> lex, "sem" -> sem), k = 10)
      .orderBy("rank")
      .select("doc_id", "n_lists", "score", "rank")
      .as[(Long, Long, Double, Int)].collect()
    def c(rank: Int): Double = 1.0 / (60.0 + rank)
    val expected = Map(
      10L -> c(1), 20L -> (c(2) + c(1)), 30L -> c(3), 40L -> c(2))
    assert(r.map(_._1).toSet === expected.keySet)
    r.foreach { case (id, nl, s, _) =>
      assert(s === expected(id), s"doc $id")
      assert(nl === (if (id == 20L) 2L else 1L))
    }
    // doc 20 appears in both lists and must outrank every solo doc
    assert(r.head._1 === 20L)
    // 10 (solo rank 1) vs 40 (solo rank 2): larger contribution first
    assert(r.map(_._1).toSeq === Seq(20L, 10L, 40L, 30L))
    // exact tie (same solo rank in different lists) → lower id first
    val t = Retrieval.rrfFuse(
        Seq("a" -> Seq((7L, 1)).toDF("doc_id", "rank"),
            "b" -> Seq((5L, 1)).toDF("doc_id", "rank")), k = 10)
      .orderBy("rank").select("doc_id").as[Long].collect()
    assert(t.toSeq === Seq(5L, 7L))
  }

  test("rrfFuse: k truncates, duplicate tags and degenerate params " +
    "refuse loudly") {
    val lex = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val sem = Seq((4L, 1)).toDF("doc_id", "rank")
    assert(Retrieval.rrfFuse(Seq("l" -> lex, "s" -> sem), k = 2)
      .count() === 2)
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("x" -> lex, "x" -> sem), k = 2) }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq.empty, k = 2) }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("l" -> lex), k = 0) }
  }
}
