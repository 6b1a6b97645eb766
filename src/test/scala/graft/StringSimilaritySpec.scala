package graft

import org.apache.spark.sql.functions._
import graft.functions.{JaroWinkler, StringSimilarity}

class StringSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("jaroWinkler: published reference values, exact doubles") {
    // the classic Winkler-paper pairs plus transposition/window cases;
    // expected values are DuckDB jaro_winkler_similarity outputs —
    // asserted EXACTLY (==), not to a tolerance: bit parity is the
    // contract the oracle hash relies on
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("dwayne", "duane", 0.8400000000000001),
      ("janedoe", "drjanedoe", 0.9259259259259259),
      ("aaapqrst", "aaapqxyz", 0.85),
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0), // zero matches
      ("bar", "baz", 0.8222222222222222))
    cases.foreach { case (a, b, want) =>
      assert(JaroWinkler.similarity(a, b) == want, s"($a, $b)")
      assert(JaroWinkler.similarity(b, a) == want, s"symmetric ($b, $a)")
    }
  }

  test("jaroWinkler: empty/edge conventions match the oracle engine " +
    "(either side empty -> 0.0, including both empty)") {
    assert(JaroWinkler.similarity("", "") == 0.0)
    assert(JaroWinkler.similarity("a", "") == 0.0)
    assert(JaroWinkler.similarity("", "abc") == 0.0)
    // single chars: equal -> 1.0; different -> 0.0 (window 0)
    assert(JaroWinkler.similarity("a", "a") == 1.0)
    assert(JaroWinkler.similarity("a", "b") == 0.0)
  }

  test("jaroWinkler: the winkler boost applies only above 0.7 and the " +
    "prefix is capped at 4") {
    // jaro("abcdefgh","abcdefQQ") = (6/8+6/8+6/6)/3 = 5/6 > 0.7:
    // prefix 4 (capped, real common prefix is 6)
    val j = (6.0 / 8 + 6.0 / 8 + 6.0 / 6) / 3.0
    assert(JaroWinkler.similarity("abcdefgh", "abcdefQQ")
      == j + 4 * 0.1 * (1.0 - j))
  }

  test("jaroWinkler: Column + SQL surfaces agree with the direct call, " +
    "nulls propagate") {
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      (null, "x"), ("x", null)).toDF("a", "b")
    val viaCol = df.select(StringSimilarity.jaroWinkler(col("a"),
      col("b")).as("jw")).as[Option[Double]].collect().toSeq
    assert(viaCol === Seq(Some(0.9611111111111111),
      Some(0.8133333333333332), None, None))
    df.createOrReplaceTempView("jw_pairs")
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler(a, b) FROM jw_pairs")
      .as[Option[Double]].collect().toSeq
    assert(viaSql === viaCol)
  }
}
