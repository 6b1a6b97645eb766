package graft

import org.apache.spark.sql.functions._
import graft.operators.{Biblio, Cooccur}

class CooccurBiblioSpec extends SparkTestBase {
  import spark.implicits._

  test("windowCooccur: hand-counted pairs, marginals, and pmi_ratio on a " +
    "two-doc corpus") {
    // doc 1 tokens: a b a   (window 2)
    //   pos pairs: (1,2)=a,b (1,3)=a,a (2,3)=b,a
    // doc 2 tokens: b c
    //   pos pairs: (1,2)=b,c
    // unordered counts: (a,a)=1 (a,b)=2 (b,c)=1  → n_slots = 8
    // marginals: a = 1 + 2 (×2 for the (a,a) self-pair? no: endpoint
    //   slots — (a,a) contributes a twice) = 2·1 + 2 = 4; b = 2+1 = 3;
    //   c = 1
    val docs = Seq((1L, "A  b a"), (2L, "b C")).toDF("doc_id", "text")
    val got = Cooccur.windowCooccur(docs, col("doc_id"), col("text"),
        window = 2)
      .orderBy("w1", "w2")
      .select("w1", "w2", "n_pair", "n_w1", "n_w2", "n_slots", "pmi_ratio")
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(got === Seq(
      ("a", "a", 1L, 4L, 4L, 8L, (1.0 * 8) / (4.0 * 4)),
      ("a", "b", 2L, 4L, 3L, 8L, (2.0 * 8) / (4.0 * 3)),
      ("b", "c", 1L, 3L, 1L, 8L, (1.0 * 8) / (3.0 * 1))))
  }

  test("windowCooccur: window=1 is adjacent bigrams only; minCount prunes " +
    "pairs but NOT marginal mass; empty docs contribute nothing") {
    val docs = Seq((1L, "x y x y"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    // window=1 pairs: (x,y)×3 → n_slots=6, marginals x=3 y=3
    val got = Cooccur.windowCooccur(docs, col("doc_id"), col("text"),
        window = 1, minCount = 2L)
      .select("w1", "w2", "n_pair", "n_w1", "n_w2", "n_slots")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("x", "y", 3L, 3L, 3L, 6L)))
    // minCount prunes the output rows, yet the marginals were taken first:
    // with a rare pair present, its mass still counts toward neighbors
    val docs2 = Seq((1L, "x y x y x z")).toDF("doc_id", "text")
    // window=1: (x,y) (y,x) (x,y)... tokens x y x y x z →
    //   (x,y) (y,x) (x,y) (y,x)?? positions: 1-2 xy, 2-3 yx, 3-4 xy,
    //   4-5 yx, 5-6 xz → (x,y)=4, (x,z)=1 → slots 10, x marg = 4+1=5,
    //   y = 4, z = 1
    val got2 = Cooccur.windowCooccur(docs2, col("doc_id"), col("text"),
        window = 1, minCount = 2L)
      .select("w1", "w2", "n_pair", "n_w1", "n_w2", "n_slots")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got2 === Seq(("x", "y", 4L, 5L, 4L, 10L)))
  }

  test("scholarIndices: textbook h/g/i10 cases, zero-cite and " +
    "single-paper groups, deterministic under permutation") {
    // group A: cites 10 8 5 4 3 → h=4 (r4: 4>=4, r5: 3<5)
    //   cums 10 18 23 27 30 vs r²=1 4 9 16 25 → g=5
    //   i10 = 1
    // group B: all zero cites → h=0 g=0
    // group C: single paper, 100 cites → h=1 g=1 (g capped by n_papers)
    val papers = Seq(
      ("A", 1L, 10L), ("A", 2L, 8L), ("A", 3L, 5L), ("A", 4L, 4L),
      ("A", 5L, 3L),
      ("B", 6L, 0L), ("B", 7L, 0L),
      ("C", 8L, 100L)
    ).toDF("author", "paper_id", "cites")
    def run(df: org.apache.spark.sql.DataFrame) =
      Biblio.scholarIndices(df, col("author"), col("paper_id"), col("cites"))
        .orderBy("grp")
        .select("grp", "n_papers", "n_cites", "h_index", "g_index", "i10")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val expect = Seq(
      ("A", 5L, 30L, 4L, 5L, 1L),
      ("B", 2L, 0L, 0L, 0L, 0L),
      ("C", 1L, 100L, 1L, 1L, 1L))
    assert(run(papers) === expect)
    // input order must not matter (window orders by cites desc, id asc)
    assert(run(papers.orderBy(col("cites").asc, col("paper_id").desc))
      === expect)
  }

  test("scholarIndices: h-index tie handling — cites equal to rank at " +
    "multiple ranks") {
    // cites 3 3 3 3 → ranks 1..4, h = 3 (r3: 3>=3, r4: 3<4)
    // g: cums 3 6 9 12 vs 1 4 9 16 → g=3
    val papers = (1L to 4L).map(i => ("X", i, 3L))
      .toDF("author", "paper_id", "cites")
    val got = Biblio.scholarIndices(papers, col("author"), col("paper_id"),
        col("cites"))
      .select("h_index", "g_index").as[(Long, Long)].collect().head
    assert(got === ((3L, 3L)))
  }
}
