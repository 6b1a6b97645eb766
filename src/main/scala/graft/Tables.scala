package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * code runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and,
  * unchanged, against a 100 TB warehouse path on a real cluster: the reads
  * are plain parquet scans, so Catalyst pushes filters/projection into the
  * scan and partition-prunes if the warehouse is partitioned.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` normalization: the driver has written this column as
    * parquet TIMESTAMP(NANOS) (arrives as LongType nanoseconds under
    * spark.sql.legacy.parquet.nanosAsLong=true, set in Verify/Bench
    * sessions) and, in newer generations, as TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (arrives as TIMESTAMP_NTZ under Spark's
    * default inferTimestampNTZ). Both are naive UTC wall clocks; fold
    * them to a session-zone TimestampType so event-time semantics
    * (watermarks require TIMESTAMP, not NTZ) and DuckDB oracle output
    * agree regardless of which generation is on disk. All graft sessions
    * pin spark.sql.session.timeZone=UTC, so the NTZ→LTZ cast maps the
    * wall clock to the identical instant. The nanos path uses integral
    * `div`, not `/`, since epoch-nanos ≈ 1.7e18 exceeds double's 2^53
    * exact-integer range. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
