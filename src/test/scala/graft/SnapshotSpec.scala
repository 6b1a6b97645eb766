package graft

import org.apache.spark.sql.functions._
import graft.operators.Snapshot

class SnapshotSpec extends SparkTestBase {
  import spark.implicits._

  private def oldSnap = Seq(
    (1L, Option("alpha"), Option(10)),
    (2L, Option("beta"), Option(20)),
    (3L, Option("gamma"), Option(30)),
    (4L, Option.empty[String], Option(40)),
    (5L, Option("eps"), Option(50))
  ).toDF("id", "body", "score")

  test("diff classifies added/removed/changed/unchanged, null-safely") {
    val newSnap = Seq(
      (1L, Option("alpha"), Option(10)),      // unchanged
      (2L, Option("beta2"), Option(20)),      // changed (body)
      (3L, Option("gamma"), Option(31)),      // changed (score)
      (4L, Option.empty[String], Option(40)), // unchanged (null == null)
      (6L, Option("zeta"), Option(60))        // added; 5 removed
    ).toDF("id", "body", "score")
    val got = Snapshot.diff(oldSnap, newSnap, "id", Seq("body", "score"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "unchanged", 5L -> "removed", 6L -> "added"))
    // the summary partial-aggregates the same delta
    val sum = Snapshot
      .diffSummary(oldSnap, newSnap, "id", Seq("body", "score"))
      .as[(String, Long)].collect().toMap
    assert(sum === Map("unchanged" -> 2L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("null vs empty string is a change, and the separator blocks " +
    "cross-column collisions") {
    val a = Seq((1L, Option.empty[String], Option("x")),
      (2L, Option("ab"), Option("")))
      .toDF("id", "c1", "c2")
    val b = Seq((1L, Option(""), Option("x")),
      (2L, Option("a"), Option("b")))
      .toDF("id", "c1", "c2")
    val got = Snapshot.diff(a, b, "id", Seq("c1", "c2"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "changed") // null -> "" must not read as unchanged
    assert(got(2L) === "changed") // ("ab","") vs ("a","b") must differ
    // data values CANNOT forge column boundaries (length-prefixed
    // encoding): a value containing the old separator/sentinel
    // characters must still read as a change
    val a2 = Seq((1L, "xy", "z"), (2L, "", "k"))
      .toDF("id", "c1", "c2")
    val b2 = Seq((1L, "x", "yz"),
      (2L, null.asInstanceOf[String], "k")).toDF("id", "c1", "c2")
    val got2 = Snapshot.diff(a2, b2, "id", Seq("c1", "c2"))
      .as[(Long, String)].collect().toMap
    assert(got2(1L) === "changed") // injected separator must not merge
    assert(got2(2L) === "changed") // literal sentinel char vs real null
  }

  test("comparing a subset of columns ignores the rest; empty snapshots " +
    "are all-added / all-removed") {
    val newSnap = oldSnap.withColumn("score", col("score") + 1)
    val bodyOnly = Snapshot.diff(oldSnap, newSnap, "id", Seq("body"))
      .as[(Long, String)].collect()
    assert(bodyOnly.forall(_._2 == "unchanged"))
    val empty = oldSnap.limit(0)
    assert(Snapshot.diff(empty, oldSnap, "id", Seq("body"))
      .as[(Long, String)].collect().forall(_._2 == "added"))
    assert(Snapshot.diff(oldSnap, empty, "id", Seq("body"))
      .as[(Long, String)].collect().forall(_._2 == "removed"))
    intercept[IllegalArgumentException](
      Snapshot.diff(oldSnap, newSnap, "id", Seq.empty))
  }

  test("plan shape: the payload is fingerprinted BELOW the full-outer " +
    "join, so only (id, md5) reaches the exchanges") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val rebuilt = docs.where(col("doc_id") % 7 =!= 0)
    val d = Snapshot.diff(docs, rebuilt, "doc_id", Seq("text"))
    d.count()
    val plan = d.queryExecution.executedPlan.toString
    // one full-outer join, keyed on the id
    assert(plan.contains("FullOuter"), s"no full-outer join:\n$plan")
    // the md5 projection sits below the exchange: no exchange row
    // carries the text column (32-hex fingerprints shuffle, pages of
    // payload do not)
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange")).toList
    assert(exchangeLines.nonEmpty)
    assert(!exchangeLines.exists(_.contains("text")),
      s"payload column reached an exchange:\n$plan")
    // and the scan itself is pruned to the two needed columns
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(reads.nonEmpty && reads.forall(r =>
      r.contains("doc_id") && r.contains("text") && !r.contains("lang")),
      s"scan not pruned to (doc_id, text): $reads")
  }
}
