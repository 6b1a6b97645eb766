package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable linear quality classifier over an embedding column — the
  * mechanism behind fasttext-style document-quality scoring in
  * large-scale training-data pipelines (score every document, keep the
  * top fraction), reduced to its Spark-native core: a batch
  * (epoch-synchronous) PERCEPTRON.
  *
  * Why a perceptron and not logistic regression: the update rule is
  * comparisons, multiplies and adds only — no `exp`, whose libm
  * implementations differ across engines — so training is bit-for-bit
  * reproducible against the DuckDB oracle the same way the k-means
  * trainer is. The Spark division of labor is also identical to
  * `Similarity.kMeans`: the per-epoch margin test is one projection
  * pass over the full corpus, the gradient is one partial-aggregating
  * groupBy of the misclassified rows' posexploded cells, and only the
  * (dim+1)-vector of weights ever reaches the driver.
  *
  * The bias is folded in as feature augmentation: every vector gets a
  * constant trailing 1.0f, so weights have dim+1 entries and the margin
  * is a single sequential-fold dot product.
  */
object Classify {

  /** Train `epochs` batch-perceptron updates:
    * w ← w + lr · Σ_misclassified y·x (y ∈ {+1,-1} from `positive`;
    * misclassified = y·(w·x) ≤ 0, so the zero-initialized first epoch
    * sums every row). With `deterministic = true` the gradient sums are
    * id-ordered sequential folds (bit-reproducible across engines and
    * partitionings — the oracle/repro mode, which buffers each
    * dimension's misclassified cells in memory); the default keeps the
    * scale-correct partial-agg `sum`. Null or null-element
    * embeddings are excluded (see `Similarity.wellFormed`).
    * Returns the (dim+1) weights, bias last. */
  def perceptronTrain(df: DataFrame, idCol: String, embCol: String,
                      positive: Column, epochs: Int, lr: Double = 1.0,
                      deterministic: Boolean = false): Array[Double] = {
    require(epochs >= 0, s"perceptronTrain: epochs=$epochs")
    val dim = Similarity.probeDim(
      df.where(Similarity.wellFormed(col(embCol))), embCol) + 1
    // the augmented array is bound behind the spread exchange BEFORE the
    // margin filter references it: the statically-unrolled margin reads
    // `a` once per element, and a filter over an inline concat would
    // re-build the (dim+1)-array per reference after predicate pushdown
    // (FilterExec does no subexpression elimination). Rows whose
    // dimension differs from the probed one are excluded like degenerate
    // vectors — the unrolled dot would otherwise silently truncate them
    // where the HOF form nulls them.
    val base = Dedup.spread(df.where(Similarity.wellFormed(col(embCol)) &&
        size(col(embCol)) === dim - 1)
      .select(col(idCol).as("id"),
        concat(col(embCol), array(lit(1.0f))).as("a"),
        when(positive, 1.0d).otherwise(-1.0d).as("y")))
    var w = new Array[Double](dim)
    for (_ <- 0 until epochs) {
      val margin = col("y") * weightDot(col("a"), w)
      val cells = base.where(margin <= 0)
        .select(col("id"), col("y"), posexplode(col("a")).as(Seq("i", "x")))
        .select(col("id"), col("i"),
          (col("y") * col("x").cast("double")).as("v"))
      val agg =
        if (deterministic)
          Similarity.sequentialSumByKey(cells, Seq("i"), "id", "v")
            .select(col("i"), col("__sum").as("g"))
        else cells.groupBy("i").agg(sum(col("v")).as("g"))
      val g = agg.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = w.zipWithIndex.map { case (wi, i) => wi + lr * g.getOrElse(i, 0.0) }
    }
    w
  }

  /** Score every row with trained weights: margin = w · (x ++ 1.0).
    * One projection pass — the shape that scores 100 TB. Returns
    * (id-named-as-input, margin, predicted = margin > 0). */
  def perceptronScore(df: DataFrame, idCol: String, embCol: String,
                      weights: Array[Double]): DataFrame =
    // same dimension contract as training: rows that don't match the
    // trained weights' dimension are excluded, not silently truncated
    df.where(Similarity.wellFormed(col(embCol)) &&
        size(col(embCol)) === weights.length - 1)
      .select(col(idCol),
        weightDot(concat(col(embCol), array(lit(1.0f))), weights)
          .as("margin"))
      .withColumn("predicted", col("margin") > 0)

  /** w · x for the full-corpus margin/scoring passes: the statically
    * unrolled form stays inside whole-stage codegen (HOF lambdas are
    * evaluated interpreted with a per-row zip_with allocation — see the
    * Similarity header) and is spec-pinned bit-identical; fall back to
    * the HOF past the dim where unrolling would blow codegen method
    * limits (Similarity.staticDot scaladoc). Callers enforce the
    * dimension contract, so both branches see equal-length inputs. */
  private def weightDot(a: Column, w: Array[Double]): Column =
    if (w.length <= 128) Similarity.staticDot(a, typedlit(w), w.length)
    else Similarity.dot(a, typedlit(w))
}
