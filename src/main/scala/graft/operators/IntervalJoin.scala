package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval overlap join — all (left, right) pairs whose CLOSED integer
  * intervals [lStart, lEnd] and [rStart, rEnd] overlap
  * (lStart <= rEnd && rStart <= lEnd), optionally also equal on
  * `equiKeys` (the SCD2 / per-entity case).
  *
  * Spark plans a raw overlap predicate as BroadcastNestedLoopJoin (or a
  * cartesian product when neither side broadcasts) — O(|L|·|R|)
  * comparisons and a broadcast ceiling on one whole side, which does
  * not exist at 100 TB. This operator makes the join an EQUI-join on a
  * grid cell: each interval explodes to the `bucketWidth`-sized cells
  * it covers, cells match by equality (plus the equi keys), and the
  * exact overlap predicate verifies each candidate. Two intervals
  * overlap iff they co-occupy at least one cell containing
  * max(lStart, rStart), so emitting a pair ONLY from that canonical
  * cell makes the result exactly-once with no distinct/dropDuplicates
  * pass — the dedup is a predicate, not a shuffle.
  *
  * Scale posture: shuffle key = (equiKeys…, cell) — cardinality grows
  * with the value domain, so long histories spread; fan-out per row =
  * ceil(len / bucketWidth) + 1 cells, so `bucketWidth` should sit near
  * the TYPICAL interval length (w >> len wastes nothing but
  * concentrates hot cells; w << len multiplies the exploded row count).
  * A single interval spanning the whole domain degenerates to a
  * broadcast-like hot row — the caller splits such sentinels (the
  * classic "open-ended validity" row) before joining, or caps them at
  * the domain bound. Cell arithmetic is floored division via pmod, so
  * negative coordinates bucket correctly.
  *
  * Column contract: left and right column names must be disjoint
  * (beyond the shared `equiKeys`, which are join keys and emitted
  * once); returns left.* ++ equiKeys-deduped right.*.
  */
object IntervalJoin {

  def overlapJoin(left: DataFrame, right: DataFrame,
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  bucketWidth: Long,
                  equiKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"overlapJoin: bucketWidth=$bucketWidth")
    val clash = left.columns.toSeq.intersect(right.columns.toSeq)
      .filterNot(equiKeys.contains)
    require(clash.isEmpty,
      s"overlapJoin: columns ${clash.mkString(", ")} exist on both sides; " +
        "rename or prefix one side first (equiKeys are exempt)")
    val reserved = Set("__cell")
    val reservedClash =
      (left.columns.toSeq ++ right.columns.toSeq).filter(reserved)
    require(reservedClash.isEmpty,
      s"overlapJoin: columns ${reservedClash.distinct.mkString(", ")} " +
        "collide with the internal __cell name; rename them first")
    // floored (not truncated) division: pmod is non-negative, so the
    // quotient rounds toward -inf for negative coordinates too. The
    // divide is Catalyst's IntegralDivide (long div long -> long), NOT
    // Column./ (always double — silently wrong past 2^53, i.e. for any
    // epoch-micros domain). Domain bound: coordinates must sit above
    // Long.MinValue + bucketWidth — `cl - pmod(cl, w)` wraps below the
    // long minimum inside that sliver (ANSI: ARITHMETIC_OVERFLOW; no
    // real time/coordinate domain reaches it)
    def fdiv(c: Column): Column = {
      val cl = c.cast("long")
      org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftBridge.expression(
            cl - pmod(cl, lit(bucketWidth))),
          org.apache.spark.sql.GraftBridge.expression(lit(bucketWidth))))
    }
    def cells(s: String, e: String)(df: DataFrame): DataFrame = df
      .where(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
      .withColumn("__cell",
        explode(sequence(fdiv(col(s)), fdiv(col(e)))))
    val l = cells(lStart, lEnd)(left).as("l")
    val r = cells(rStart, rEnd)(right).as("r")
    val keyCond = equiKeys
      .map(k => col(s"l.$k") === col(s"r.$k"))
      .foldLeft(lit(true))(_ && _)
    val joined = l.join(r,
      col("l.__cell") === col("r.__cell") && keyCond &&
        col(s"l.$lStart") <= col(s"r.$rEnd") &&
        col(s"r.$rStart") <= col(s"l.$lEnd") &&
        // canonical cell: every overlapping pair co-occupies the cell of
        // max(start, start); emit there and nowhere else
        col("l.__cell") === fdiv(greatest(col(s"l.$lStart"),
          col(s"r.$rStart"))))
    val rightOut = right.columns.toSeq.filterNot(equiKeys.contains)
      .map(c => col(s"r.$c").as(c))
    val leftOut = left.columns.toSeq.map(c => col(s"l.$c").as(c))
    joined.select(leftOut ++ rightOut: _*)
  }
}
