package graft.operators

import scala.language.existentials // parquet's Statistics[T <: Comparable[T]]

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scan efficiency — the write-side levers that
  * decide how much of a 100 TB corpus a query has to READ. The reference
  * (a single-process pandas pipeline) has no analogue: it re-reads whole
  * files per run (`main.py` load loop); at cluster scale the equivalent
  * decision is the dominant IO cost, so the engine makes it a
  * first-class operator family:
  *
  *  - [[sortedLayout]]: range-partition + sort by the filter columns so
  *    parquet row-group/file min-max statistics become tight and
  *    disjoint — a selective range predicate then touches a bounded
  *    number of files instead of all of them (the reader prunes row
  *    groups from footer stats; the planner shows the predicate under
  *    `PushedFilters`).
  *  - [[zValue]]: bit-interleaved Z-order key, the standard multi-column
  *    generalization — sorting by the interleaved key keeps BOTH
  *    columns' min-max ranges tight per file, where a lexicographic
  *    sort only prunes on the leading column.
  *  - [[bucketedTable]]: hash-bucketed, bucket-sorted table layout — a
  *    join or aggregation on the bucket column needs NO shuffle of the
  *    bucketed side (the scan reports the bucket spec as its output
  *    partitioning), the standard mechanism for repeated big-big joins
  *    on a stable key.
  *  - [[rowGroupLongStats]] / [[matchingFiles]]: footer-statistics
  *    diagnostics that make the pruning measurable — the same min-max
  *    metadata the parquet reader consults, surfaced so layouts can be
  *    audited and spec'd instead of trusted.
  */
object Layout {

  /** Write `df` as parquet range-partitioned and sorted by `sortCols`.
    *
    * `numFiles` bounds the file count (one file per range partition via
    * `maxRecordsPerFile`-free single-task partitions); at corpus scale
    * pick `numFiles` ≈ corpus bytes / target file size (512 MB-1 GB is
    * the usual parquet sweet spot). The sort is what gives every file a
    * tight, near-disjoint [min, max] on the sort columns — range
    * partitioning alone leaves row groups inside a file unsorted, which
    * still prunes at FILE granularity but not row-group.
    *
    * Layout is semantically a no-op (same rows, different physical
    * order) — pinned by the q_layout_sorted oracle; the pruning payoff
    * is pinned by LayoutSpec over [[rowGroupLongStats]].
    */
  def sortedLayout(df: DataFrame, outDir: String, sortCols: Seq[Column],
                   numFiles: Int): Unit = {
    require(numFiles > 0, s"sortedLayout: numFiles=$numFiles")
    df.repartitionByRange(numFiles, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Z-order key: bit-interleave the low 32 bits of two non-negative
    * integer columns (a's bit i lands at 2i+1, b's at 2i). Sorting by
    * the interleaved key clusters rows that are close in BOTH
    * dimensions, so min-max pruning works for predicates on either
    * column — the lexicographic alternative prunes only the leading
    * one. Callers map values into [0, 2³²) first (ranks, scaled
    * measures, dictionary codes); the curve only needs relative order,
    * not exact magnitudes.
    *
    * Pure bit arithmetic (shifts/and/or), one constant-size codegen'd
    * expression tree — no UDF.
    */
  def zValue(a: Column, b: Column): Column = {
    val terms = (0 until 32).flatMap { i =>
      Seq(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1),
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }
    // flip the sign bit so the LONG ordering equals the UNSIGNED curve
    // ordering: a's bit 31 lands at position 63, and without the flip
    // every a >= 2^31 key sorts negative — the upper half of the
    // documented [0, 2^32) domain would sort BEFORE the lower half and
    // the file spanning the signed boundary gets full-range stats
    terms.reduce(_ bitwiseOR _).bitwiseXOR(lit(Long.MinValue))
  }

  /** Write `df` as a hash-bucketed, bucket-sorted external table at
    * `path`, registered as `tableName`. A subsequent join or
    * aggregation on `bucketCol` against another table bucketed the same
    * way (same column, same `nBuckets`) plans with NO shuffle on either
    * side and, with the bucket-sort, no sort either — the scan itself
    * satisfies the join's distribution and ordering requirements
    * (spec-pinned: zero `Exchange hashpartitioning` in the join
    * subtree). This is the 100 TB answer to a fact-fact join that runs
    * every day on the same key: pay the shuffle once at write time,
    * never again at read time.
    *
    * The table is external (data under `path`); re-creating it drops
    * the catalog entry first so Verify/Bench reps are idempotent.
    */
  def bucketedTable(df: DataFrame, tableName: String, path: String,
                    bucketCol: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, s"bucketedTable: nBuckets=$nBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Per-(file, row group) min/max footer statistics for one INT64/INT32
    * parquet column — the exact metadata the reader's row-group pruning
    * consults, surfaced for layout audits. Driver-side by design: this
    * reads FOOTERS only (KBs per file), the same listing cost every
    * Spark scan pays at planning time; it is a diagnostic, not a data
    * path.
    *
    * Conservative by construction: a row group with NO statistics for
    * the column (stats disabled, non-numeric type, or the column absent
    * from the file) reports the full [Long.MinValue, Long.MaxValue]
    * range — the reader cannot prune such a row group, so every
    * range predicate "matches" it, and [[matchingFiles]] counts its
    * file as must-read instead of silently overstating the pruning win.
    */
  def rowGroupLongStats(spark: SparkSession, dir: String,
                        column: String): Seq[(String, Int, Long, Long)] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val files = fs.listStatus(new Path(dir))
      .filter(f => f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).sortBy(_.getName)
    files.toSeq.flatMap { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map {
          case (block, rg) =>
            val known = block.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .flatMap { cc =>
                val st = cc.getStatistics
                if (st == null || !st.hasNonNullValue) None
                else (st.genericGetMin, st.genericGetMax) match {
                  case (mn: Number, mx: Number) =>
                    Some((p.getName, rg, mn.longValue(), mx.longValue()))
                  case _ => None
                }
              }
            known.getOrElse((p.getName, rg, Long.MinValue, Long.MaxValue))
        }
      } finally reader.close()
    }
  }

  /** The files a [lo, hi] range predicate on `column` has to read,
    * given footer stats — i.e. the file-level pruning decision the
    * reader makes. `LayoutSpec` pins that a sorted layout shrinks this
    * set while an unsorted one cannot. Stats-less row groups arrive
    * from [[rowGroupLongStats]] as full-range rows, so their files
    * always count as must-read here — the reader's own behavior.
    */
  def matchingFiles(stats: Seq[(String, Int, Long, Long)],
                    lo: Long, hi: Long): Set[String] =
    stats.collect { case (f, _, mn, mx) if mx >= lo && mn <= hi => f }.toSet
}
