package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with the
  * same key and right time <= left time (LEFT semantics: unmatched left
  * rows keep nulls).
  *
  * Spark has no built-in as-of join; per the custom-operator preference
  * order this is COMPOSED from built-ins (union + last-ignoreNulls
  * carry-forward window) rather than a custom SparkPlan: one shuffle on
  * the key, one sort within partitions — the same cost profile a native
  * as-of merge would have, with zero planner surface to maintain.
  *
  * Scale: the union stream is keyed on (key) — high cardinality; no
  * range-condition BroadcastNestedLoop blowup, no per-key materialization.
  * Ties (right.time == left.time) match, mirroring DuckDB's ASOF
  * `ON r.t <= l.t` (right rows sort before left rows at equal time).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           rightCols: Seq[String]): DataFrame = {
    // the final drop(rightCols) removes ALL columns with those names, so a
    // left column sharing a name with any rightCol would silently vanish
    val clash = left.columns.toSeq.intersect(rightCols)
    require(clash.isEmpty,
      s"asOf: left columns ${clash.mkString(", ")} collide with rightCols; " +
        "rename or prefix the right columns first")
    // internal scratch names and the generated asof_<col> outputs would be
    // silently clobbered by the withColumn/drop sequence below
    val reserved = Set("__t", "__side", "__asof") ++ rightCols.map("asof_" + _)
    val reservedClash =
      (left.columns.toSeq ++ right.columns.toSeq).filter(reserved)
    require(reservedClash.isEmpty,
      s"asOf: columns ${reservedClash.distinct.mkString(", ")} collide with " +
        "internal (__t/__side/__asof) or output (asof_<col>) names; " +
        "rename them first")
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // carry the right row as ONE struct: carrying each column through its
    // own last(ignoreNulls) would stitch fields from DIFFERENT right rows
    // whenever a right column holds a null (row tearing). A null right
    // TIME never matches anything (rightTime <= leftTime is undefined),
    // so such rows carry nothing — without the guard they sort
    // nulls-first and their struct would leak into every left row
    // before the first real right row.
    val rightStruct = when(col("__side") === 0 && col("__t").isNotNull,
      struct(rightCols.map(col): _*))
    // deterministic tiebreak among right rows sharing (key, time): the
    // LARGEST carried struct wins (field-order lexicographic) — without
    // it, last() picks a partition-layout-dependent row and the as-of
    // output is non-deterministic under time collisions. Left rows have
    // a null struct; their relative order within a frame is irrelevant
    // (each left row reads the frame up to itself).
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc, rightStruct.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__asof", last(rightStruct, ignoreNulls = true).over(w))
    // drop EVERY right-only column, not just rightCols: unionByName
    // added the rest to left rows as all-null, and leaking them out
    // would hand callers phantom null columns (schema-pinned writes,
    // unionByName downstream)
    val rightOnly = right.columns.toSeq.diff(left.columns.toSeq)
    rightCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", col("__asof").getField(c))
    }
      .where(col("__side") === 1)
      .drop("__t" :: "__side" :: "__asof" :: rightOnly.toList: _*)
  }
}
