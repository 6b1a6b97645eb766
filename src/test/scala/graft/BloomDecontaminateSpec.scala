package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class BloomDecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val bench = Seq(
    (1000L, "the quick brown fox jumps over the lazy dog"),
    (1001L, "colorless green ideas sleep furiously tonight again")
  ).toDF("doc_id", "text")

  private lazy val corpus = Seq(
    // verbatim benchmark contamination
    (1L, "prefix words the quick brown fox jumps over the lazy dog suffix"),
    // partial overlap (one shared trigram window region)
    (2L, "green ideas sleep furiously under bridges"),
    // clean
    (3L, "entirely unrelated content about spark physical plans"),
    (4L, "another clean document with its own vocabulary set")
  ).toDF("doc_id", "text")

  private def byId(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "n_sh", "n_matched").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("bloom path never false-negatives: per doc n_matched >= exact, " +
    "and planted contamination is fully recalled") {
    val exact = byId(Dedup.contaminationScores(
      corpus, col("doc_id"), col("text"), bench, col("doc_id"), col("text")))
    val bloom = byId(Dedup.contaminationScoresBloom(
      corpus, col("doc_id"), col("text"), bench, col("doc_id"), col("text")))
    assert(bloom.keySet === exact.keySet)
    exact.foreach { case (id, (nSh, nMatched)) =>
      val (bSh, bMatched) = bloom(id)
      assert(bSh === nSh)
      assert(bMatched >= nMatched,
        s"doc $id: bloom $bMatched < exact $nMatched — false negative")
    }
    // the verbatim-contaminated doc really is flagged by both paths
    assert(exact(1L)._2 > 0)
    assert(bloom(1L)._2 > 0)
  }

  test("false-positive excess is bounded by the sizing at a tight fpp") {
    val exact = byId(Dedup.contaminationScores(
      corpus, col("doc_id"), col("text"), bench, col("doc_id"), col("text")))
    val bloom = byId(Dedup.contaminationScoresBloom(
      corpus, col("doc_id"), col("text"), bench, col("doc_id"), col("text"),
      expectedItems = 1024, fpp = 1e-6))
    // ~20 probes at fpp 1e-6: any FP at all would be a sizing bug
    exact.foreach { case (id, (_, nMatched)) =>
      assert(bloom(id)._2 === nMatched,
        s"doc $id: unexpected false positive at fpp=1e-6")
    }
  }

  test("empty benchmark side -> zero matches but every document present " +
    "(null-filter probe mirrors the empty-broadcast exact path)") {
    val emptyBench = bench.where(lit(false))
    val bloom = byId(Dedup.contaminationScoresBloom(
      corpus, col("doc_id"), col("text"), emptyBench,
      col("doc_id"), col("text")))
    assert(bloom.keySet === Set(1L, 2L, 3L, 4L))
    bloom.values.foreach { case (_, nMatched) => assert(nMatched === 0L) }
  }

  test("sizing guards reject degenerate parameters") {
    intercept[IllegalArgumentException] {
      Dedup.contaminationScoresBloom(corpus, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text"), fpp = 1.5)
    }
    intercept[IllegalArgumentException] {
      Dedup.contaminationScoresBloom(corpus, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text"), expectedItems = 0)
    }
  }

  test("decontaminateSpans: an UNALIGNED leaked run is removed (bench " +
    "windows slide stride-1), clean spans survive, a fully leaked doc " +
    "comes back empty, short tail chunks match truncated windows") {
    // chunkWords = 3; bench text "alpha beta gamma delta epsilon"
    val b = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val c = Seq(
      // grid span [0] = "beta gamma delta" = bench window at bench
      // offset 1 — removed ONLY because the bench side slides stride-1
      (1L, "beta gamma delta own tail here"),
      // span [0] = bench offset 0; span [1] = the doc's short 2-word
      // tail, equal to a TRUNCATED bench tail window -> all removed
      (2L, "alpha beta gamma delta epsilon"),
      // clean
      (3L, "completely separate vocabulary lives here today"),
      // the grid cutting a leak across two spans keeps both — span
      // resolution is the documented contract, not substring removal
      (4L, "own words beta gamma delta tail words here")
    ).toDF("doc_id", "text")
    val r = Dedup.decontaminateSpans(c, col("doc_id"), col("text"),
        b, col("text"), chunkWords = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(r === Seq(
      (1L, "own tail here", 2L, 1L),
      (2L, "", 2L, 2L),
      (3L, "completely separate vocabulary lives here today", 2L, 0L),
      (4L, "own words beta gamma delta tail words here", 3L, 0L)))
  }
}
