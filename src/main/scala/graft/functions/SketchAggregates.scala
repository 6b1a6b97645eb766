package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter sketch (Misra & Gries 1982) as a native
  * `TypedImperativeAggregate` — the MERGEABLE frequency summary (Agarwal
  * et al. 2012, "Mergeable summaries") that turns "find every item above
  * a frequency share" into one partial+final aggregate pass instead of a
  * full-vocabulary shuffle.
  *
  * Guarantees (the spec-pinned contract; the sketch output itself is NOT
  * hash-oracle-able because which BORDERLINE items survive depends on
  * merge order):
  *  - reported count is a LOWER bound: count_lb(x) <= true(x);
  *  - undercount is bounded: true(x) - count_lb(x) <= N/(k+1) for the
  *    processed mass N — every decrement event subtracts equal mass from
  *    >= k+1 distinct items at once, and total subtracted mass is <= N;
  *  - completeness: every item with true(x) > N/(k+1) is IN the sketch
  *    (its counter cannot reach zero), under any partitioning/merge
  *    order. `HeavyHitters.exactHeavyHitters` builds on exactly this to
  *    produce a deterministic, oracle-able result.
  *
  * Buffer is a hash map of at most k counters; serialization is
  * (size, [utf8 item, varint-free long count]*). Update adds 1; overflow
  * subtracts the current MINIMUM counter from every entry and drops
  * zeros (the weighted generalization, needed so merge — counter-wise
  * addition followed by the same shrink — preserves the bound).
  */
case class MisraGriesAgg(child: Expression, k: Int,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"MisraGriesAgg: k=$k must be >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_lb", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Add weighted mass, then restore |buffer| <= k by subtracting the
    * minimum counter from all entries (>= k+1 of them at that moment)
    * and dropping zeros — repeat if several inserts arrived via merge. */
  private def addWeighted(buf: mutable.HashMap[String, Long],
                          item: String, w: Long): Unit = {
    buf.update(item, buf.getOrElse(item, 0L) + w)
    while (buf.size > k) {
      val mn = buf.valuesIterator.min
      buf.filterInPlace((_, c) => c > mn)
      buf.mapValuesInPlace((_, c) => c - mn)
    }
  }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) addWeighted(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreach { case (item, w) => addWeighted(buf, item, w) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic PRESENTATION (count desc, item asc) — the content
    // itself still depends on merge order at the margin, by design
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
  override def prettyName: String = "graft_misra_gries"
}

object SketchAggregates {
  /** Misra-Gries sketch aggregate over a string column: array of
    * (item, count_lb) structs, at most k entries, count-desc order. */
  def misraGries(item: Column, k: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.expression(item), k).toAggregateExpression())
}
