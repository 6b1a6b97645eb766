package graft

import org.apache.spark.sql.functions._
import graft.operators.Pack
import graft.functions.TextAnalysis

/** Sequence packing (concat-and-chunk) + TF-IDF term scoring. */
class PackTfidfSpec extends SparkTestBase {
  import spark.implicits._

  test("concatChunk: offsets tile each bucket contiguously, seq/offset " +
    "are exact integer chunking of the running sum") {
    val docs = (1L to 200L).map(i => (i, 10L + i % 7)).toDF("id", "n")
    val packed = Pack.concatChunk(docs, col("id"), col("n"),
        budget = 64L, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(packed.length === 200)
    // offsets in range; (seq, offset) = exact div/mod of the cumulative
    // prefix, so within a bucket the intervals [seq*B+off, +n) tile
    // 0..total contiguously in SOME order — verify by sorting starts
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val starts = rows.map { case (_, _, n, seq, off) =>
        assert(off >= 0 && off < 64, s"offset $off out of range")
        (seq * 64 + off, n)
      }.sortBy(_._1)
      starts.sliding(2).foreach {
        case Array((s1, n1), (s2, _)) => assert(s1 + n1 === s2,
          s"gap/overlap in packing: $s1+$n1 != $s2")
        case _ =>
      }
      assert(starts.head._1 === 0L) // first doc starts the bucket
    }
    // total sequences = ceil(bucket tokens / budget) per bucket
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val total = rows.map(_._3).sum
      val lastSeq = rows.map(_._4).max
      assert(lastSeq === (total - 1) / 64 ||
        rows.exists { case (_, _, n, s, o) => s == lastSeq && o + n > 0 })
    }
  }

  test("concatChunk: layout is deterministic under input repartitioning " +
    "and independent of partition count") {
    val docs = (1L to 500L).map(i => (i, 5L + i % 11)).toDF("id", "n")
    val a = Pack.concatChunk(docs, col("id"), col("n"), 128L, 8)
      .collect().toSet
    val b = Pack.concatChunk(docs.repartition(13), col("id"), col("n"),
      128L, 8).collect().toSet
    assert(a === b)
  }

  test("concatChunk rejects non-positive budget/buckets") {
    val docs = Seq((1L, 2L)).toDF("id", "n")
    intercept[IllegalArgumentException](
      Pack.concatChunk(docs, col("id"), col("n"), 0L))
    intercept[IllegalArgumentException](
      Pack.concatChunk(docs, col("id"), col("n"), 10L, buckets = 0))
  }

  test("tfidfTopK: hand-checked scores, rank by score desc then term") {
    val docs = Seq(
      (1L, "apple apple banana"),   // apple tf=2, banana tf=1
      (2L, "banana cherry"),        // banana df=2, cherry df=1
      (3L, "cherry date date date") // date tf=3 df=1
    ).toDF("id", "text")
    val out = TextAnalysis.tfidfTopK(docs, col("id"), col("text"), k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "rank", "tok", "tf", "df", "score")
      .as[(Long, Int, String, Long, Long, Double)].collect()
    // doc 1: apple 2/1=2.0 beats banana 1/2=0.5
    assert(out.filter(_._1 == 1L).map(r => (r._3, r._6)).toSeq ===
      Seq(("apple", 2.0), ("banana", 0.5)))
    // doc 2: cherry 1/2=0.5 ties banana 1/2=0.5 -> term asc breaks tie
    assert(out.filter(_._1 == 2L).map(_._3).toSeq ===
      Seq("banana", "cherry"))
    // doc 3: date 3/1=3.0 beats cherry 0.5
    assert(out.filter(_._1 == 3L).map(r => (r._3, r._6)).toSeq ===
      Seq(("date", 3.0), ("cherry", 0.5)))
  }
}
