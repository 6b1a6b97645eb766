package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent driver-side reference BPE (Sennrich alg. 1): word-freq
    * map, count adjacent pairs, merge the (count desc, pair asc) best,
    * repeat. */
  private def referenceTrain(texts: Seq[String], numMerges: Int)
      : (Seq[(String, String)], Map[String, Seq[String]]) = {
    var vocab: Map[Seq[String], Long] = texts
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString): Seq[String]) -> ws.size.toLong
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (merges.length < numMerges && continue) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val (l, r) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += ((l, r))
        vocab = vocab.map { case (syms, f) =>
          val next = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
              next += l + r; j += 2
            } else { next += syms(j); j += 1 }
          }
          next.toSeq -> f
        }
      }
    }
    val finalSyms = vocab.keys
      .map(syms => syms.mkString -> syms).toMap
    (merges.toSeq, finalSyms)
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower widest widest widest",
    "newest newest newest newest newest newest"
  )

  test("train matches the driver-side reference merge-for-merge and " +
    "encode reproduces each training word's final segmentation") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (refMerges, refSegs) = referenceTrain(corpus, 10)
    val got = Bpe.train(docs, col("text"), 10)
    assert(got.toSeq === refMerges)
    // encode with the trained table reproduces training segmentations
    val words = corpus.flatMap(_.split("\\s+")).distinct
    val enc = words.toDF("w")
      .select(col("w"), Bpe.encode(col("w"), got).as("toks"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(enc(w) === refSegs(w), s"word $w segmented differently")
    }
    // trainTable is the same merges with ranks attached
    val table = Bpe.trainTable(docs, col("text"), 10)
      .orderBy("rank").as[(Int, String, String)].collect()
    assert(table.map(t => (t._2, t._3)).toSeq === refMerges)
    assert(table.map(_._1).toSeq === refMerges.indices)
  }

  test("pairCounts weights by word frequency; ties break to the " +
    "lexicographically smaller pair") {
    val docs = Seq((1L, "ab ab ab cd cd cd")).toDF("doc_id", "text")
    val pairs = Bpe.initialPairCounts(docs, col("text"))
      .as[(String, String, Long)].collect().toSet
    assert(pairs === Set(("a", "b", 3L), ("c", "d", 3L)))
    // (a,b) and (c,d) tie at 3 -> first merge must be (a,b)
    assert(Bpe.train(docs, col("text"), 1).toSeq === Seq(("a", "b")))
  }

  test("encode edges: null text -> null, empty/whitespace -> empty " +
    "array, unknown symbols pass through, leftmost-first merging, " +
    "lower rank wins") {
    val merges = Array(("a", "a"), ("l", "o"))
    val rows = Seq((1L, "aaa"), (2L, "lol xyz"), (3L, ""), (4L, "   "),
      (5L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = rows.select(col("id"),
        Bpe.encode(col("text"), merges).as("toks"))
      .as[(Long, Option[Seq[String]])].collect().toMap
    assert(got(1L).get === Seq("aa", "a")) // leftmost-first, no overlap
    assert(got(2L).get === Seq("lo", "l", "x", "y", "z"))
    assert(got(3L).get === Seq.empty)
    assert(got(4L).get === Seq.empty)
    assert(got(5L).isEmpty) // null propagates
    // rank priority: ("b","c") before ("a","b") must segment "abc"
    // as a + bc even though (a,b) appears first left-to-right
    val ranked = Seq((1L, "abc")).toDF("id", "text")
      .select(Bpe.encode(col("text"),
        Array(("b", "c"), ("a", "b"))).as("toks"))
      .as[Seq[String]].head()
    assert(ranked === Seq("a", "bc"))
    // empty merge table: pure character split
    val none = Seq((1L, "hi yo")).toDF("id", "text")
      .select(Bpe.encode(col("text"),
        Array.empty[(String, String)]).as("toks"))
      .as[Seq[String]].head()
    assert(none === Seq("h", "i", "y", "o"))
  }

  test("train stops early when every word is fully merged; numMerges=0 " +
    "returns an empty table") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // round 1 merges (a,b); afterwards every word is one symbol
    assert(Bpe.train(docs, col("text"), 5).toSeq === Seq(("a", "b")))
    assert(Bpe.train(docs, col("text"), 0).isEmpty)
  }
}
