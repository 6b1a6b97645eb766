package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions.{concat, conv, lit, md5, substring}
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

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native
  * `TypedImperativeAggregate`: `depth` rows of `width` counters;
  * update adds 1 to one counter per row, merge is ELEMENTWISE ADDITION.
  * That makes the sketch fully ORDER-INDEPENDENT — unlike Misra-Gries,
  * whose borderline content is merge-order dependent, a Count-Min
  * sketch of a dataset is a deterministic function of its multiset, so
  * queries over it sit directly under the hash oracle.
  *
  * Estimate(x) = min over d of cell[d][h_d(x)]; never underestimates
  * (every occurrence of x lands in the probed cells), overestimates by
  * the colliding mass (expected <= N/width per row, so the min over
  * `depth` independent rows is within eN/width with prob 1-e^-depth).
  *
  * Hashes are ENGINE-REPRODUCIBLE by construction (the md5 discipline
  * of Shard/sampling): h_d(x) = first 12 bits of md5(d || ':' || x),
  * width fixed at 4096 so a SQL oracle addresses the same cell via
  * substr(md5(..), 1, 3) — the 3-hex-char bucket string is bijective
  * with the index. At 100 TB the aggregate state is depth*width longs
  * per partition (96 KiB at 3x4096) regardless of item cardinality —
  * the whole point vs a vocabulary-sized groupBy.
  */
case class CountMinAgg(child: Expression, depth: Int,
                       override val mutableAggBufferOffset: Int = 0,
                       override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16,
    s"CountMinAgg: depth=$depth out of [1, 16]")

  val width: Int = CountMinAgg.Width

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  // MessageDigest is not thread-safe; one per aggregate instance is
  // safe (Spark evaluates an aggregate buffer single-threaded) but
  // instances are shared across partitions in codegen'd paths — keep a
  // thread-local to be safe
  @transient private lazy val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 12 bits of md5(d || ':' || item) — equals the 3-hex-char
    * bucket substr(md5(..), 1, 3) a SQL engine computes. */
  private def bucket(d: Int, item: String): Int = {
    val dig = md5Local.get()
    dig.reset()
    val h = dig.digest((d.toString + ":" + item)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((h(0) & 0xff) << 4) | ((h(1) & 0xf0) >>> 4)
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      var d = 0
      while (d < depth) {
        buf(d * width + bucket(d, item)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box).asInstanceOf[Array[Any]])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
  override def prettyName: String = "graft_count_min"
}

object CountMinAgg {
  /** 4096 = 3 hex chars: keeps the cell addressable from SQL. */
  val Width = 4096
}

object SketchAggregates {
  /** Misra-Gries sketch aggregate over a string column: array of
    * (item, count_lb) structs, at most k entries, count-desc order. */
  def misraGries(item: Column, k: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.expression(item), k).toAggregateExpression())

  /** Count-Min sketch aggregate over a string column: depth*4096 longs,
    * row-major; estimate(x) = min over d of cell[d*4096 + h_d(x)]. */
  def countMin(item: Column, depth: Int): Column =
    GraftBridge.column(
      CountMinAgg(GraftBridge.expression(item), depth).toAggregateExpression())

  /** The engine-reproducible Count-Min bucket as a Column (for reading
    * the sketch relationally): first 12 bits of md5(d || ':' || item),
    * identical to the aggregate's internal hash. */
  def countMinBucket(d: Int, item: Column): Column =
    conv(substring(md5(concat(lit(d.toString), lit(":"), item)), 1, 3),
      16, 10).cast("int")
}
