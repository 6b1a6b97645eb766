package graft

import org.apache.spark.sql.functions._
import graft.functions.{HllAgg, SketchAggregates}

class HllSpec extends SparkTestBase {
  import spark.implicits._

  private val hex = 2
  private val m = 256

  private def registers(items: Seq[String], parts: Int = 4): Seq[Int] =
    items.toDF("x").repartition(parts)
      .agg(SketchAggregates.hllSketch(col("x"), hex).as("sk"))
      .head().getSeq[Int](0)

  test("registerOf matches the SQL addressing contract on knowns") {
    // md5('hello') = 5d41402abc4b2a76b9719d911017c592:
    // idx = 0x5d = 93; tail 13 hex = 41402abc4b2a7 (52 bits, top nibble
    // 0100 -> one leading zero -> rho 2)
    assert(HllAgg.registerOf("hello", 2) === (93, 2))
    // v = 0 edge: rho = 53 - length(bin(0)) = 52 by the shared
    // '0'-string convention (not 53)
    assert(53 - java.lang.Long.toBinaryString(0L).length === 52)
  }

  test("sketch is a pure function of the input SET: partitioning, " +
    "order, and duplication all produce identical registers") {
    val items = (1 to 2000).map(i => s"item$i")
    val base = registers(items, parts = 1)
    assert(registers(items.reverse, parts = 8) === base)
    assert(registers(items ++ items ++ items.take(500), parts = 32) === base)
    assert(base.length === m)
  }

  test("merge of per-group sketches == sketch of the union, exactly") {
    val a = (1 to 800).map(i => s"a$i")
    val b = (500 to 1500).map(i => s"b$i")
    val merged = registers(a).zip(registers(b)).map { case (x, y) =>
      math.max(x, y)
    }
    assert(merged === registers(a ++ b))
  }

  test("estimate readout: raw estimator within 5 standard errors at " +
    "n >= 2.5m, and bit-identical to the driver-side fold") {
    val n = 5000
    val items = (1 to n).map(i => s"doc-$i")
    val est = items.toDF("x")
      .agg(SketchAggregates.hllSketch(col("x"), hex).as("sk"))
      .select(SketchAggregates.hllEstimate(col("sk"), hex).as("e"))
      .head().getDouble(0)
    val se = 1.04 / math.sqrt(m.toDouble) // ~6.5% at m=256
    assert(math.abs(est - n) / n < 5 * se, s"estimate $est vs $n")
    // driver replay of the documented IEEE chain
    val regs = registers(items, parts = 1)
    var s = 0.0
    regs.foreach(r => s += 1.0 / (1L << r).toDouble)
    val replay = 0.7213 / (1.0 + 1.079 / m.toDouble) *
      m.toDouble * m.toDouble / s
    assert(est === replay)
  }

  test("nulls are skipped; empty input keeps all-zero registers") {
    val got = Seq[String](null, null).toDF("x")
      .agg(SketchAggregates.hllSketch(col("x"), hex).as("sk"))
      .head().getSeq[Int](0)
    assert(got.forall(_ === 0) && got.length === m)
  }
}
