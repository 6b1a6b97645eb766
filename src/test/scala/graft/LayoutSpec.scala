package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    System.getProperty("java.io.tmpdir") + s"/graft_layout_spec_$name"

  test("sortedLayout: lossless, near-disjoint per-file ranges, and a " +
    "selective predicate prunes most files (unsorted layout cannot)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "n_chars", "lang")
    val sortedDir = tmp("sorted")
    val unsortedDir = tmp("unsorted")
    Layout.sortedLayout(docs, sortedDir, Seq(col("n_chars")), numFiles = 8)
    // control: same data, same file count, no sort
    docs.repartition(8).write.mode("overwrite").parquet(unsortedDir)

    // lossless: layout is a physical-order change only
    val back = spark.read.parquet(sortedDir)
    assert(back.count() === docs.count())
    assert(back.except(docs).count() === 0)
    assert(docs.except(back).count() === 0)

    val sortedStats = Layout.rowGroupLongStats(spark, sortedDir, "n_chars")
    val unsortedStats = Layout.rowGroupLongStats(spark, unsortedDir, "n_chars")
    assert(sortedStats.nonEmpty && unsortedStats.nonEmpty)

    // a ~25%-of-value-space range predicate
    val vals = docs.select(min("n_chars"), max("n_chars"))
      .as[(Long, Long)].head()
    val (lo, hi) = (vals._1, vals._1 + (vals._2 - vals._1) / 4)
    val sortedFiles = sortedStats.map(_._1).toSet
    val hit = Layout.matchingFiles(sortedStats, lo, hi)
    val hitUnsorted = Layout.matchingFiles(unsortedStats, lo, hi)
    // sorted: bounded read — at most half the files for a quarter of the
    // value space (range boundaries can straddle); unsorted: every file
    // overlaps every popular value range
    assert(hit.size <= sortedFiles.size / 2,
      s"sorted layout matched ${hit.size}/${sortedFiles.size} files")
    assert(hitUnsorted.size === unsortedStats.map(_._1).toSet.size,
      "control should be unprunable — every file spans the range")

    // and the reader actually receives the predicate: PushedFilters
    val q = spark.read.parquet(sortedDir)
      .where(col("n_chars") >= lo && col("n_chars") <= hi)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(n_chars), " +
      "GreaterThanOrEqual(n_chars,") || scan.contains("GreaterThanOrEqual"),
      s"range predicate not pushed:\n$scan")
  }

  test("zValue interleaves bits (reference check) and orders both " +
    "dimensions locally") {
    // reference interleave on the driver; sign bit flipped so LONG
    // order == unsigned curve order across the whole [0, 2^32) domain
    def zRef(a: Long, b: Long): Long =
      (0 until 32).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
      } ^ Long.MinValue
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (0xffffffffL, 0L), (0L, 0xffffffffL), (123456789L, 987654321L))
    val got = cases.toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z"))
      .as[Long].collect()
    assert(got.toSeq === cases.map { case (a, b) => zRef(a, b) })
    // locality: a 2-bit-quadrant grid — all points of a quadrant sort
    // contiguously (the property pruning relies on)
    val grid = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val byZ = grid.sortBy { case (a, b) => zRef(a, b) }
    val quadrantOf: ((Long, Long)) => (Long, Long) = {
      case (a, b) => (a / 8, b / 8)
    }
    val runs = byZ.map(quadrantOf).foldLeft(List.empty[(Long, Long)]) {
      (acc, q) => if (acc.headOption.contains(q)) acc else q :: acc
    }
    assert(runs.size === 4, s"quadrants interleaved: $runs")
    // UNSIGNED ordering across the signed boundary: the upper half of
    // the 32-bit domain must sort AFTER the lower half (pre-fix, keys
    // with a >= 2^31 went negative and sorted first)
    val lowHalf = zRef(0x7fffffffL, 0L)
    val highHalf = zRef(0x80000000L, 0L)
    assert(lowHalf < highHalf,
      s"signed boundary broke the curve: $lowHalf !< $highHalf")
  }

  test("parquet aggregate pushdown: min/max/count answered from footer " +
    "stats, no row read") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "n_chars")
    val out = tmp("aggpd")
    Layout.sortedLayout(docs, out, Seq(col("n_chars")), numFiles = 4)
    // aggregate pushdown is a V2-file-source feature: parquet must come
    // off the v1 list for the session of this query (both confs
    // restored — the DedupSpec checkpoint-dir lesson)
    val aggKey = "spark.sql.parquet.aggregatePushdown"
    val v1Key = "spark.sql.sources.useV1SourceList"
    val prevAgg = spark.conf.get(aggKey, "false")
    val prevV1 = spark.conf.get(v1Key)
    spark.conf.set(aggKey, "true")
    spark.conf.set(v1Key,
      prevV1.split(",").filterNot(_.trim == "parquet").mkString(","))
    try {
      val q = spark.read.parquet(out)
        .selectExpr("min(n_chars) AS mn", "max(n_chars) AS mx",
          "count(*) AS n")
      val got = q.collect()(0)
      assert(q.queryExecution.executedPlan.toString
        .contains("PushedAggregation: [MIN(n_chars), MAX(n_chars), COUNT(*)]"),
        "aggregate not pushed to the parquet footer")
      val exp = docs.agg(min("n_chars"), max("n_chars"), count(lit(1)))
        .collect()(0)
      assert(got.getLong(0) === exp.getLong(0))
      assert(got.getLong(1) === exp.getLong(1))
      assert(got.getLong(2) === exp.getLong(2))
    } finally {
      spark.conf.set(aggKey, prevAgg)
      spark.conf.set(v1Key, prevV1)
    }
  }

  test("bucketed tables join with zero shuffles and match the plain join") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name")
    Layout.bucketedTable(orders, "layout_spec_orders", tmp("borders"),
      "o_custkey", nBuckets = 4)
    Layout.bucketedTable(customer, "layout_spec_customer", tmp("bcust"),
      "c_custkey", nBuckets = 4)
    val j = spark.table("layout_spec_orders")
      .join(spark.table("layout_spec_customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("total"))
    val n = j.count()
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    // same result as the un-bucketed join
    val plainN = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey").agg(count(lit(1))).count()
    assert(n === plainN)
  }
}
