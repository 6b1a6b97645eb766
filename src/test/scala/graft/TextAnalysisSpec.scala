package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val r = Seq("hello world", "one, two!  three", "", "   ")
      .toDF("t")
      .select(TextAnalysis.wsTokenCount(col("t")).as("ws"),
        TextAnalysis.bpeishTokenCount(col("t")).as("bpe"))
      .as[(Int, Int)].collect()
    assert(r(0) === ((2, 2)))
    assert(r(1) === ((3, 5)))     // one , two ! three
    assert(r(2) === ((0, 0)))
    assert(r(3) === ((0, 0)))
  }

  test("degenerate text yields nulls, not ANSI errors (ADVICE r1)") {
    val r = Seq("", "   ", "!!!")
      .toDF("t")
      .select(TextAnalysis.avgWordLen(col("t")).as("a"),
        TextAnalysis.punctRatio(col("t")).as("p"),
        TextAnalysis.qualityScore(col("t")).as("q"))
      .collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(!r(0).isNullAt(2)) // quality still defined (0.0)
    assert(r(2).getDouble(1) === 1.0) // "!!!" all punctuation
  }

  test("quality score components") {
    val good = ("the quick brown fox is a fine animal and it jumps " * 4).trim
    val r = Seq(good).toDF("t")
      .select(TextAnalysis.qualityScore(col("t"))).as[Double].head()
    assert(r === 1.0) // long enough, low punct, stopwords, sane word length
  }

  test("langId picks the argmax marker language, und when no markers") {
    val r = Seq(
      "the cat and the dog of the house",
      "el perro de la casa que los gatos",
      "le chat est dans les maisons des gens",
      "der hund ist mit das und ein katze",
      "zzz qqq www")
      .toDF("t").select(TextAnalysis.langId(col("t"))).as[String].collect()
    assert(r === Seq("en", "es", "fr", "de", "und"))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val r = Seq("Hello   World", "hello world").toDF("t")
      .select(TextAnalysis.fingerprint(col("t"))).as[String].collect()
    assert(r(0) === r(1))
  }

  test("rollingFingerprint is order-sensitive and total on empty") {
    val r = Seq("a b c", "c b a", "a b c", "")
      .toDF("t").select(TextAnalysis.rollingFingerprint(col("t")))
      .as[Long].collect()
    assert(r(0) === r(2))
    assert(r(0) !== r(1))
  }

  test("SQL surface: registered graft_* functions equal the Column API") {
    val row = spark.sql(
      """SELECT graft_fingerprint(' A   b ') AS fp,
        |       graft_normalize_text(' A   b ') AS nt,
        |       graft_redact_pii('mail a@b.co or +1 555-123-4567') AS red
        |""".stripMargin).head()
    val expect = Seq(" A   b ").toDF("t")
      .select(TextAnalysis.fingerprint(col("t"))).as[String].head()
    assert(row.getString(0) === expect)
    assert(row.getString(1) === "a b")
    assert(row.getString(2) === "mail <EMAIL> or <PHONE>")
    // arity misuse is rejected at registration-builder level
    intercept[Exception] { spark.sql("SELECT graft_fingerprint('a','b')") }
  }
}
