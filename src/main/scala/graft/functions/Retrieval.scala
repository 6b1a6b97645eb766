package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 full-text relevance ranking over a document frame — the
  * retrieval primitive a training-data pipeline needs for targeted
  * corpus slicing (pull the documents most relevant to a benchmark
  * topic, build eval-adjacent held-out sets, seed DSIR target slices)
  * without an external search engine.
  *
  * Shape (reference has no retrieval operator; this extends the
  * engine's text-analysis family, same normalized token stream as
  * `TextAnalysis.tfidfTopK`):
  *
  *   tokens explode → filter to the query's terms (a tiny literal set,
  *   applied BEFORE the aggregate so the (doc, term) matrix only ever
  *   contains query terms — at 100 TB the post-filter tf frame is
  *   |query| × |matching docs|, not the corpus vocabulary) → tf
  *   partial+final count → df as a count window keyed on the term
  *   (one shuffle, the `tfidfTopK` plan) → corpus stats (N, Σdl) as a
  *   single partial-agg row broadcast-cross-joined back → per-term
  *   BM25 → per-doc sequential fold → global top-k via
  *   TakeOrderedAndProject (partial per-partition top-k, no global
  *   sort materialization).
  *
  * Arithmetic contract: the classic ln-damped Robertson idf rides on
  * libm and is not bit-reproducible across engines (the same reason
  * `tfidfTopK` uses the linear idf), so scoring uses the RATIONAL idf
  *   idf(t) = (N − df + 0.5) / (df + 0.5)
  * — the inside of Robertson's ln, rank-equivalent to it for a
  * single-term query and the standard +/·//-only surrogate — and every
  * double op is written in the same order the SQL oracle evaluates, so
  * a DuckDB oracle hashes the SCORE itself, not a rounded shadow of
  * it. The per-doc sum over matched terms is a term-ordered sequential
  * fold (`list_sum(list(s ORDER BY tok))` on a sequential engine);
  * constants are composed with column arithmetic (`1.0 − b`,
  * `k1 + 1.0`) so both engines round the SAME two literals, not
  * Scala-side pre-folded ones.
  *
  * Documents containing none of the query terms score 0 and are not
  * returned. Output: (doc_id, dl, n_terms, score, rank), rank 1..k by
  * (score desc, doc_id asc).
  */
object Retrieval {

  def bm25TopK(docs: DataFrame, id: Column, text: Column,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    require(k > 0, s"bm25TopK: k=$k")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val base = docs.select(id.as("doc_id"),
        TextAnalysis.normText(text).as("__t"))
      .select(col("doc_id"), split(col("__t"), " ").as("ws"),
        // empty text = ZERO tokens: split("") yields [""], and dl=1
        // phantom tokens from punctuation-only docs inflate sum_dl and
        // skew every score through avgdl
        when(col("__t") === "", lit(0))
          .otherwise(size(split(col("__t"), " "))).as("dl"))
    // one row: corpus size + total token count — exact integer sums, so
    // avgdl is ONE double division on identical operands in any engine
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("ws")).as("tok"))
      .where(col("tok").isInCollection(terms))
      .groupBy("doc_id", "dl", "tok")
      .agg(count(lit(1)).as("tf"))
    // df over the tf frame: one row per (doc, term) ⇒ count = doc-freq
    val df = tf.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("tok")))
    val scored = df.crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)))
      .withColumn("s",
        col("idf") * (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) *
            ((lit(1.0) - lit(b)) + lit(b) * col("dl") / col("avgdl"))))
    scored
      .groupBy("doc_id", "dl")
      .agg(collect_list(struct(col("tok"), col("s"))).as("__xs"),
        count(lit(1)).as("n_terms"))
      .select(col("doc_id"), col("dl"), col("n_terms"),
        aggregate(array_sort(col("__xs")), lit(0.0),
          (acc, x) => acc + x.getField("s")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id").asc)))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009: RRF
    * outperforms Condorcet and individual-rank learning) — the standard
    * way to combine a lexical and a semantic ranking without score
    * calibration: each input ranking contributes 1/(kRrf + rank) for a
    * document it ranked, and documents are re-ranked by the summed
    * contribution. Rank positions are comparable across retrievers
    * where raw scores (BM25 vs cosine) never are, which is why hybrid
    * search engines fuse on ranks.
    *
    * Inputs are (tag, ranking) pairs, each ranking a frame carrying
    * `idCol` and `rankCol` (1-based; `bm25TopK` and the ANN top-k
    * family all emit exactly that shape). Tags must be distinct — the
    * per-document sum is a TAG-ORDERED sequential fold (the engine's
    * standard bit-reproducible sum over a small keyed set), so a DuckDB
    * oracle replays the score to the bit with
    * `list_sum(list(x ORDER BY src))`.
    *
    * Scale posture: the inputs are already top-k frames (bounded —
    * k rows per retriever), so the union + groupBy is driver-trivial
    * at any corpus scale; the heavy lifting happened inside the input
    * retrievers. Output: (idCol, n_lists, score, rank), rank 1..k by
    * (score desc, id asc). */
  def rrfFuse(rankings: Seq[(String, DataFrame)], k: Int,
              kRrf: Int = 60, idCol: String = "doc_id",
              rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no input rankings")
    require(rankings.map(_._1).distinct.size == rankings.size,
      s"rrfFuse: duplicate ranking tags in ${rankings.map(_._1)} — the " +
        "tag orders the per-document fold and must identify its list")
    require(k > 0 && kRrf > 0, s"rrfFuse: k=$k, kRrf=$kRrf")
    val tagged = rankings.map { case (tag, r) =>
      r.select(col(idCol),
        lit(tag).as("__src"),
        (lit(1.0) / (lit(kRrf).cast("double") + col(rankCol)))
          .as("__x"))
    }.reduce(_ unionByName _)
    tagged
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_lists"),
        aggregate(array_sort(collect_list(struct(col("__src"),
            col("__x")))), lit(0.0),
          (acc, s) => acc + s.getField("__x")).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col(idCol).asc)))
  }
}
