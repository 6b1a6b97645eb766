package graft

import org.apache.spark.sql.functions._
import graft.operators.Importance

class ImportanceSpec extends SparkTestBase {
  import spark.implicits._

  // target slice (src = "good") speaks pure spark-ese; raw corpus adds
  // sql-ese docs the target never uses
  private val docs = Seq(
    (1L, "spark join spark join spark join spark join", "good"),
    (2L, "spark join spark join spark window spark join", "good"),
    (3L, "spark join spark join spark join window join", "raw"),
    (4L, "select where select where select where select where", "raw"),
    (5L, "select where group order select where group order", "raw"),
    (6L, "x", "raw"),       // 1 token: no bigram features
    (7L, null, "raw")       // null text: no features
  ).toDF("doc_id", "text", "src")

  test("hashedNgramCounts: exact bigram multiset, stable bucketing, " +
    "short/null docs drop out") {
    val tiny = Seq((1L, "a b c"), (2L, "a b a b a"), (3L, "solo"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = Importance.hashedNgramCounts(tiny, col("doc_id"), col("text"))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2)))
    // doc 1: "a b", "b c" once each; doc 2: "a b" ×2, "b a" ×2
    assert(r.count(_._1 == 1L) === 2)
    assert(r.filter(_._1 == 1L).map(_._3).toSet === Set(1L))
    assert(r.filter(_._1 == 2L).map(_._3).sorted.toSeq === Seq(2L, 2L))
    assert(!r.exists(x => x._1 == 3L || x._1 == 4L))
    // the "a b" gram lands in the SAME bucket for both docs (hashing is
    // a pure function of the gram text)
    val ab1 = r.filter(x => x._1 == 1L).map(_._2).toSet
    val ab2 = r.filter(x => x._1 == 2L).map(_._2).toSet
    assert(ab1.intersect(ab2).nonEmpty)
    assert(r.forall(x => x._2 >= 0 && x._2 < 4096))
  }

  test("importanceWeights: target-like documents outscore off-target " +
    "ones; featureless docs are excluded") {
    val w = Importance.importanceWeights(docs, col("doc_id"), col("text"),
        col("src") === "good")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(w.keySet === Set(1L, 2L, 3L, 4L, 5L))
    // doc 3 is one gram away from the target style; docs 4/5 share no
    // grams with it at all
    assert(w(3L)._2 > w(4L)._2 && w(3L)._2 > w(5L)._2)
    // every doc has 7 bigrams
    assert(w.values.map(_._1).toSet === Set(7L))
    // the pure-target docs score above the off-target ones too
    assert(w(1L)._2 > w(4L)._2 && w(2L)._2 > w(5L)._2)
  }

  test("importanceResample: quota + determinism; near-zero temperature " +
    "degenerates to greedy top-logw") {
    def run(seed: String, temp: Double) =
      Importance.importanceResample(docs, col("doc_id"), col("text"),
        col("src") === "good", quota = 3, temperature = temp, seed = seed)
        .select("doc_id").as[Long].collect().toSet
    val a = run("s1", 1.0)
    assert(a.size === 3)
    assert(a === run("s1", 1.0), "same seed must replay the same sample")
    // temperature → 0: logw/T dominates every Gumbel perturbation, so
    // the draw is exactly the top-3 by weight
    val w = Importance.importanceWeights(docs, col("doc_id"), col("text"),
        col("src") === "good")
      .orderBy(col("logw").desc, col("doc_id")).limit(3)
      .select("doc_id").as[Long].collect().toSet
    assert(run("s1", 1e-9) === w)
    intercept[IllegalArgumentException] {
      Importance.importanceResample(docs, col("doc_id"), col("text"),
        col("src") === "good", quota = 0) }
    intercept[IllegalArgumentException] {
      Importance.importanceResample(docs, col("doc_id"), col("text"),
        col("src") === "good", quota = 1, temperature = 0.0) }
    intercept[IllegalArgumentException] {
      Importance.hashedNgramCounts(docs, col("doc_id"), col("text"),
        buckets = 1) }
  }
}
