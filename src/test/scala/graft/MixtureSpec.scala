package graft

import org.apache.spark.sql.functions._
import graft.operators.Mixture

class MixtureSpec extends SparkTestBase {
  import spark.implicits._

  // 100 / 25 / 4 docs across three domains
  private val docs = (
    (1L to 100L).map(i => (i, "web")) ++
    (101L to 125L).map(i => (i, "books")) ++
    (126L to 129L).map(i => (i, "code"))
  ).toDF("doc_id", "src")

  test("temperatureQuotas: sqrt weights, exact floor allocation, " +
    "flattening vs natural proportions") {
    val q = Mixture.temperatureQuotas(docs, col("src"), budget = 60)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // weights: 10, 5, 2 → total 17; quotas: floor(60·w/17)
    assert(q("web") === ((100L, 10.0, (60.0 * 10 / 17).floor.toLong)))
    assert(q("books") === ((25L, 5.0, (60.0 * 5 / 17).floor.toLong)))
    assert(q("code") === ((4L, 2.0, (60.0 * 2 / 17).floor.toLong)))
    // α=0.5 flattens: code gets 2/17 ≈ 11.7% of the budget vs 3.1%
    // natural share; web drops from 77.5% to 58.8%
    val natural = 100.0 / 129.0
    assert(q("web")._3.toDouble / 60 < natural)
    // α=1 reproduces natural proportions exactly
    val n1 = Mixture.temperatureQuotas(docs, col("src"), budget = 129,
        alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(n1 === Map("web" -> 100L, "books" -> 25L, "code" -> 4L))
  }

  test("temperatureSample: per-domain md5-rank fill, caps respected, " +
    "deterministic across runs") {
    val s = Mixture.temperatureSample(docs, col("doc_id"), col("src"),
      budget = 60)
    val byDomain = s.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain === Map("web" -> 35L, "books" -> 17L, "code" -> 4L))
    // a domain smaller than its quota contributes all its docs
    assert(byDomain("code") === 4L)
    // determinism: same draw both times
    val a = s.select("doc_id").as[Long].collect().toSet
    val b = Mixture.temperatureSample(docs, col("doc_id"), col("src"),
      budget = 60).select("doc_id").as[Long].collect().toSet
    assert(a === b)
    // ranks within a domain are 1..n in (md5(id), id) order
    val webRanks = s.where(col("domain") === "web")
      .select("rk").as[Int].collect().sorted
    assert(webRanks.toSeq === (1 to 35))
    intercept[IllegalArgumentException] {
      Mixture.temperatureQuotas(docs, col("src"), budget = 0) }
    intercept[IllegalArgumentException] {
      Mixture.temperatureQuotas(docs, col("src"), budget = 10,
        alpha = 1.5) }
  }

  test("uniMaxQuotas: ascending-size fold, caps bind for the tail and " +
    "the reclaimed budget flows to the head") {
    // budget 60 across (code 4, books 25, web 100), ascending:
    //   code:  min(4,  60/3=20) = 4,  rem 56
    //   books: min(25, 56/2=28) = 25, rem 31
    //   web:   min(100, 31/1)   = 31  — the reclaimed 16+3 landed here
    val q = Mixture.uniMaxQuotas(docs, col("src"), budget = 60)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(q === Map("code" -> ((4L, 4L)), "books" -> ((25L, 25L)),
      "web" -> ((100L, 31L))))
    // maxEpochs raises the tail cap: code may repeat ×3 = 12
    val q3 = Mixture.uniMaxQuotas(docs, col("src"), budget = 60,
        maxEpochs = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(q3("code") === 12L)     // min(4*3, 20)
    assert(q3.values.sum === 60L)  // head absorbs the rest exactly
    // budget below the domain count: floor shares give the earliest
    // (smallest) domains 0 until the divisor catches up
    val tiny = Mixture.uniMaxQuotas(docs, col("src"), budget = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tiny === Map("code" -> 0L, "books" -> 1L, "web" -> 1L))
    intercept[IllegalArgumentException] {
      Mixture.uniMaxQuotas(docs, col("src"), budget = 0) }
    intercept[IllegalArgumentException] {
      Mixture.uniMaxQuotas(docs, col("src"), budget = 10, maxEpochs = 0) }
  }

  test("uniMaxSample: fill equals quotas per domain, deterministic, " +
    "null domains are never drawn") {
    val s = Mixture.uniMaxSample(docs, col("doc_id"), col("src"),
      budget = 60)
    val byDomain = s.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain === Map("web" -> 31L, "books" -> 25L, "code" -> 4L))
    // the web fill is the SAME md5-rank prefix temperatureSample uses
    val webTemp = Mixture.temperatureSample(docs, col("doc_id"),
        col("src"), budget = 60)
      .where(col("domain") === "web").where(col("rk") <= 31)
      .select("doc_id").as[Long].collect().toSet
    val webUni = s.where(col("domain") === "web")
      .select("doc_id").as[Long].collect().toSet
    assert(webUni === webTemp)
    // a null domain gets a quota row but is never drawn by the fill
    val withNull = docs.unionByName(
      Seq((900L, null.asInstanceOf[String])).toDF("doc_id", "src"))
    val qn = Mixture.uniMaxQuotas(withNull, col("src"), budget = 60)
    assert(qn.where(col("domain").isNull).count() === 1)
    val sn = Mixture.uniMaxSample(withNull, col("doc_id"), col("src"),
      budget = 60)
    assert(sn.where(col("doc_id") === 900L).count() === 0)
  }

  test("uniMaxQuotas: non-finite double domain values don't crash the " +
    "typed tiebreak and sort greatest (Spark sort order), fold intact") {
    // BigDecimal(NaN.toString) throws NumberFormatException; the
    // comparator must route non-finite floating values through
    // Double.compare instead. Domain sizes are EQUAL so the tiebreak is
    // exercised on every adjacent pair.
    val dd = (
      (1L to 4L).map(i => (i, 1.5)) ++
      (5L to 8L).map(i => (i, Double.NaN)) ++
      (9L to 12L).map(i => (i, Double.PositiveInfinity)) ++
      (13L to 16L).map(i => (i, -2.0))
    ).toDF("doc_id", "dom")
    val q = Mixture.uniMaxQuotas(dd, col("dom"), budget = 10)
      .collect().map(r => r.getDouble(0) -> r.getLong(2))
    // ascending-size fold with equal sizes walks the tiebreak order:
    // -2.0, 1.5, +Inf, NaN (NaN greatest, like Spark/SQL sorts);
    // shares: min(4,10/4)=2, min(4,8/3)=2, min(4,6/2)=3, min(4,3/1)=3
    assert(q.map(_._1).takeWhile(!_.isNaN) === Seq(-2.0, 1.5,
      Double.PositiveInfinity))
    assert(q.last._1.isNaN)
    assert(q.map(_._2) === Seq(2L, 2L, 3L, 3L))
  }
}
