package graft

import org.apache.spark.sql.functions._
import graft.operators.Classify

/** Batch perceptron: the trainable quality-scoring mechanism (see
  * Classify.scala). Specs pin convergence on separable data, mean-mode
  * prediction parity, and the degenerate edges. */
class ClassifySpec extends SparkTestBase {
  import spark.implicits._

  // separable by the sign of the first coordinate, with a wide margin
  private def separable = (1 to 40).map { i =>
    val sign = if (i % 2 == 0) 1f else -1f
    (i.toLong, Array(sign * (1f + (i % 5)), (i % 3) * 0.1f), i % 2 == 0)
  }.toDF("vec_id", "embedding", "is_pos")

  test("perceptron separates a linearly separable set and both gradient " +
    "modes predict identically") {
    val w = Classify.perceptronTrain(separable, "vec_id", "embedding",
      positive = col("is_pos"), epochs = 10)
    val scored = Classify.perceptronScore(separable, "vec_id", "embedding", w)
      .join(separable.select("vec_id", "is_pos"), Seq("vec_id"))
    assert(scored.where(col("predicted") =!= col("is_pos")).count() === 0,
      "perceptron failed to separate a separable set in 10 epochs")
    val wd = Classify.perceptronTrain(separable, "vec_id", "embedding",
      positive = col("is_pos"), epochs = 10, deterministic = true)
    val pd = Classify.perceptronScore(separable, "vec_id", "embedding", wd)
      .select("vec_id", "predicted").as[(Long, Boolean)].collect().toMap
    val p = scored.select("vec_id", "predicted")
      .as[(Long, Boolean)].collect().toMap
    assert(pd === p)
  }

  test("perceptron edges: epochs=0 predicts all-negative (zero weights); " +
    "null embeddings excluded; converged model stops updating") {
    val w0 = Classify.perceptronTrain(separable, "vec_id", "embedding",
      positive = col("is_pos"), epochs = 0)
    assert(w0.forall(_ === 0.0))
    val withNull = separable.unionByName(
      Seq((99L, null.asInstanceOf[Array[Float]], true))
        .toDF("vec_id", "embedding", "is_pos"))
    val scored = Classify.perceptronScore(withNull, "vec_id", "embedding", w0)
    assert(scored.count() === 40) // null row dropped
    assert(scored.where(col("predicted")).count() === 0) // margin 0 -> false
    // once separated, further epochs are no-ops (no misclassified rows)
    val w10 = Classify.perceptronTrain(separable, "vec_id", "embedding",
      positive = col("is_pos"), epochs = 10, deterministic = true)
    val w11 = Classify.perceptronTrain(separable, "vec_id", "embedding",
      positive = col("is_pos"), epochs = 11, deterministic = true)
    assert(w10.toSeq === w11.toSeq)
  }

  test("text perceptron separates a vocabulary-disjoint corpus and " +
    "predicts its training labels") {
    val docs = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "good solid prose with substance", true)
      else (i.toLong, "spam junk noise filler garbage", false)
    }.toDF("doc_id", "text", "is_pos")
    val w = Classify.textPerceptronTrain(docs, "doc_id", "text",
      positive = col("is_pos"), epochs = 3)
    val scored = Classify.textPerceptronScore(docs, "doc_id", "text", w)
      .join(docs.select("doc_id", "is_pos"), Seq("doc_id"))
    assert(scored.where(col("predicted") =!= col("is_pos")).count() === 0)
    // all-integer margins: longs, no float column anywhere
    assert(scored.schema("margin").dataType ===
      org.apache.spark.sql.types.LongType)
    // partitioning-invariant (integer partial aggs cannot drift)
    val w2 = Classify.textPerceptronTrain(docs.repartition(7), "doc_id",
      "text", positive = col("is_pos"), epochs = 3)
    assert(w.orderBy("bucket").collect().toSeq ===
      w2.orderBy("bucket").collect().toSeq)
  }

  test("text perceptron: bias carries gram-less documents; epochs=0 " +
    "scores zero margins") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", true),
      (2L, "", false),           // no grams: bias feature only
      (3L, "zz", false)          // single token: no bigram, bias only
    ).toDF("doc_id", "text", "is_pos")
    val w = Classify.textPerceptronTrain(docs, "doc_id", "text",
      positive = col("is_pos"), epochs = 2)
    val m = Classify.textPerceptronScore(docs, "doc_id", "text", w)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    // every doc scores (the bias reaches all three), margins defined
    assert(m.keySet === Set(1L, 2L, 3L))
    // gram-less docs carry exactly the bias weight as margin
    val bias = w.where(col("bucket") === -1)
      .select("w").as[Long].collect().head
    assert(m(2L) === bias && m(3L) === bias)
    // zero epochs: empty weight table, margin 0, predicted false
    val w0 = Classify.textPerceptronTrain(docs, "doc_id", "text",
      positive = col("is_pos"), epochs = 0)
    assert(w0.count() === 0)
    val s0 = Classify.textPerceptronScore(docs, "doc_id", "text", w0)
      .as[(Long, Long, Boolean)].collect()
    assert(s0.forall(r => r._2 === 0L && !r._3))
  }
}
