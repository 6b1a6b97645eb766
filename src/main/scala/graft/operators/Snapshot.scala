package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the data-versioning delta between two builds of the
  * same corpus (what a nightly training-data pipeline reports after
  * every rebuild: which documents appeared, vanished, or changed).
  *
  * The reference pipeline re-reads whole result sets between stages and
  * has no notion of build-over-build deltas; this operator is part of
  * the continuous-pipeline extension surface (SURVEY.md §2.11), sibling
  * to the incremental dedup index (`Dedup.persistIndex`): the index
  * answers "is this NEW batch novel?", the diff answers "what did the
  * rebuild CHANGE?".
  *
  * Scale shape: each side is reduced to `(id, fingerprint)` BEFORE the
  * join — the fingerprint is one md5 over the compared columns, so the
  * full-outer join shuffles two skinny columns per side no matter how
  * wide the compared payload is (at 100 TB the payload never moves; 32
  * hex chars per row do). One shuffle per side, keyed on the id —
  * co-partitioned snapshots (bucketed by id) would shuffle nothing.
  *
  * Contract: `idCol` must be unique within each snapshot (a corpus
  * primary key — the same contract every dedup survivor set satisfies).
  * Null handling: the fingerprint is a LENGTH-PREFIXED encoding —
  * `N` for null, `V<charlen>:<value>` otherwise, concatenated — so no
  * data value can forge a column boundary (separator characters CAN
  * occur in raw corpus text, and a separator-joined encoding would
  * then report ("x\u0001y", "z") vs ("x", "y\u0001z") as unchanged).
  * The encoding is prefix-free, so distinct column tuples map to
  * distinct pre-hash strings; null == null counts as unchanged,
  * mirroring SQL's IS NOT DISTINCT FROM.
  */
object Snapshot {

  /** Row-level delta: one row per id present in either snapshot, with
    * `status` ∈ added | removed | changed | unchanged. Columns:
    * (idCol, status). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
           cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Snapshot.diff: no columns to compare")
    def slim(df: DataFrame, fpName: String) =
      df.select(col(idCol).as("__id"),
        md5(concat(cols.map { c =>
          val s = col(c).cast("string")
          when(s.isNull, lit("N"))
            .otherwise(concat(lit("V"), length(s).cast("string"),
              lit(":"), s))
        }: _*)).as(fpName))
    slim(oldSnap, "__fp_old")
      .join(slim(newSnap, "__fp_new"), Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__fp_old").isNull, lit("added"))
          .when(col("__fp_new").isNull, lit("removed"))
          .when(col("__fp_old") === col("__fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The one-line build report: status → row count. Partial-aggregates
    * over the diff, so the driver sees ≤ 4 rows. */
  def diffSummary(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
                  cols: Seq[String]): DataFrame =
    diff(oldSnap, newSnap, idCol, cols)
      .groupBy("status").agg(count(lit(1)).as("n"))
}
