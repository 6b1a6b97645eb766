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
}
