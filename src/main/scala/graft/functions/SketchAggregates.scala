package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions.{aggregate, array_sort, concat, conv,
  element_at, filter, lit, md5, size, substring, transform, typedlit}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
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
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k >= 1, s"MisraGriesAgg: k=$k must be >= 1")

  // analysis-time typing: wrong-typed input gets an implicit cast or a
  // clean analysis error, not an executor-side ClassCastException
  override def inputTypes: Seq[DataType] = Seq(StringType)

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
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16,
    s"CountMinAgg: depth=$depth out of [1, 16]")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  val width: Int = CountMinAgg.Width

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      var d = 0
      while (d < depth) {
        buf(d * width + SketchHash.bucket12(d, item)) += 1L
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

/** The engine-reproducible 12-bit sketch hash shared by every Count-Min
  * shaped aggregate: first 12 bits of md5(d || ':' || item), equal to
  * the 3-hex-char bucket `substr(md5(..), 1, 3)` a SQL engine computes.
  * MessageDigest is not thread-safe; instances may be shared across
  * partitions in codegen'd paths, so the digest is thread-local. */
private[functions] object SketchHash {
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def bucket12(d: Int, item: String): Int = {
    val h = md5Bytes(d.toString + ":" + item)
    ((h(0) & 0xff) << 4) | ((h(1) & 0xf0) >>> 4)
  }

  /** Raw md5 digest through the thread-local instance — shared with
    * [[HllAgg]] so no per-row `getInstance` lands on an update path. */
  def md5Bytes(item: String): Array[Byte] = {
    val dig = md5Local.get()
    dig.reset()
    dig.digest(item.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}

/** Dyadic Count-Min sketch over a NON-NEGATIVE long domain
  * [0, 2^levels) — the mergeable summary that upgrades Count-Min from
  * point frequencies to RANK (and so quantile) queries (Cormode &
  * Muthukrishnan 2005, the dyadic-decomposition construction): one
  * Count-Min row-set per dyadic level l counts the prefixes v >> l, and
  * rank(x) = #{v <= x} decomposes into at most `levels` dyadic-node
  * estimates, each a min-over-depth cell read.
  *
  * Why not `percentile_approx`: Spark's GK summaries are
  * merge-order-sensitive (two runs can disagree), while this sketch —
  * like [[CountMinAgg]] — merges by ELEMENTWISE ADDITION, so the state
  * is a deterministic function of the input multiset: rank readouts sit
  * directly under the hash oracle, and the same frozen sketch artifact
  * answers any later rank/quantile without re-scanning. Estimates
  * NEVER underestimate (each node estimate >= its true count); the
  * overcount is bounded by levels · eN/width with prob 1-e^-depth.
  *
  * Item strings are `l || '|' || (v >> l)` under [[SketchHash]], so a
  * SQL engine addresses the same cell via
  * `substr(md5(d || ':' || l || '|' || (v >> l)), 1, 3)`. State is
  * levels × depth × 4096 longs per partition (≈1.6 MiB at 17×3) —
  * cardinality-independent, the point vs a value-keyed shuffle.
  * Out-of-domain values FAIL the job (a silently dropped or aliased
  * value would corrupt every rank answered from the artifact).
  */
case class DyadicCmsAgg(child: Expression, levels: Int, depth: Int,
                        override val mutableAggBufferOffset: Int = 0,
                        override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(levels >= 1 && levels <= 40,
    s"DyadicCmsAgg: levels=$levels out of [1, 40]")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  require(depth >= 1 && depth <= 16,
    s"DyadicCmsAgg: depth=$depth out of [1, 16]")

  val width: Int = CountMinAgg.Width

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](levels * depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (x < 0 || (levels < 63 && x >= (1L << levels)))
        throw new IllegalArgumentException(
          s"DyadicCmsAgg: value $x outside [0, 2^$levels)")
      var l = 0
      while (l < levels) {
        val item = s"$l|${x >>> l}"
        var d = 0
        while (d < depth) {
          buf(l * depth * width + d * width +
            SketchHash.bucket12(d, item)) += 1L
          d += 1
        }
        l += 1
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

  override def withNewMutableAggBufferOffset(offset: Int): DyadicCmsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DyadicCmsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): DyadicCmsAgg =
    copy(child = c)
  override def prettyName: String = "graft_dyadic_count_min"
}

/** HyperLogLog-shaped distinct-count sketch (Flajolet et al. 2007) as a
  * native `TypedImperativeAggregate`, built on the ENGINE-REPRODUCIBLE
  * md5 register discipline of [[CountMinAgg]] instead of an opaque
  * library hash — so the whole artifact, registers AND estimate, sits
  * under the cross-engine hash oracle (Spark's own
  * `approx_count_distinct` is HLL++ with engine-private xxhash state:
  * correct, but un-oracle-able — the battery keeps it rows-only by
  * design; this sketch is the auditable mirror).
  *
  * Register layout: m = 16^hexChars registers; an item routes to
  * register `substr(md5(item), 1, hexChars)` and contributes
  * rho = 53 - length(bin(v)) where v = the NEXT 13 hex chars (52 bits)
  * of the same digest — i.e. one plus the count of leading zeros in
  * the 52-bit tail, with the v = 0 edge pinned to 52 by the shared
  * `length(bin(0)) = 1` convention (bit-identical in DuckDB and
  * `java.lang.Long.toBinaryString`). Register value = MAX rho seen.
  *
  * Merge is ELEMENTWISE MAX, so like Count-Min (and unlike GK or
  * Misra-Gries) the sketch is a pure function of the input SET — any
  * partitioning, any merge order, any duplication of inputs produces
  * identical registers: merge-of-partials ≡ recompute-on-union holds
  * EXACTLY, which is what lets daily sketches serve rolling distinct
  * counts without re-scanning facts. State is m small ints per
  * partition regardless of cardinality (m = 256 at hexChars = 2 —
  * 1 KiB; standard error 1.04/√m ≈ 6.5%).
  *
  * The ESTIMATE is deliberately not computed here: it is a
  * deterministic arithmetic readout of the registers
  * ([[SketchAggregates.hllEstimate]] — ascending-index sequential fold
  * of exact 2^-reg terms, one multiply, one divide), kept relational so
  * the oracle replays the identical IEEE chain. Raw-estimator bias
  * below ~2.5m distincts is the documented HLL trade (production HLL++
  * switches to linear counting there); callers pick m against their
  * expected cardinality floor.
  */
case class HllAgg(child: Expression, hexChars: Int,
                  override val mutableAggBufferOffset: Int = 0,
                  override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  // >= 2: the asymptotic alpha_m constant hllEstimate applies is the
  // documented-correct one only for m >= 128 (Flajolet et al. 2007 use
  // alpha_16 = 0.673 at m = 16 — a ~0.4% systematic skew the shared
  // formula would silently add)
  require(hexChars >= 2 && hexChars <= 3,
    s"HllAgg: hexChars=$hexChars out of [2, 3]")

  val m: Int = 1 << (4 * hexChars)

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val (idx, rho) =
        HllAgg.registerOf(v.asInstanceOf[UTF8String].toString, hexChars)
      if (rho > buf(idx)) buf(idx) = rho
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Int]): Any =
    new GenericArrayData(buf.map(Int.box).asInstanceOf[Array[Any]])

  override def serialize(buf: Array[Int]): Array[Byte] = {
    // registers are <= 52: one byte each
    val out = new Array[Byte](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toByte; i += 1 }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] =
    bytes.map(_.toInt)

  override def withNewMutableAggBufferOffset(offset: Int): HllAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): HllAgg =
    copy(child = c)
  override def prettyName: String = "graft_hll"
}

object HllAgg {
  /** (register index, rho) of one item — the single definition the
    * aggregate, the spec and the SQL-oracle contract share. Index =
    * first `hexChars` hex chars of md5(item); rho = 53 - bit-length of
    * the NEXT 13 hex chars as a 52-bit integer (bit-length of 0 is 1,
    * the `bin(0) = '0'` convention). */
  def registerOf(item: String, hexChars: Int): (Int, Int) = {
    val h = SketchHash.md5Bytes(item)
    var idx = 0
    var nib = 0
    while (nib < hexChars) {
      val b = h(nib / 2) & 0xff
      idx = (idx << 4) | (if (nib % 2 == 0) b >>> 4 else b & 0xf)
      nib += 1
    }
    var v = 0L
    var n = hexChars
    while (n < hexChars + 13) {
      val b = h(n / 2) & 0xff
      v = (v << 4) | (if (n % 2 == 0) b >>> 4 else b & 0xf)
      n += 1
    }
    (idx, 53 - java.lang.Long.toBinaryString(v).length)
  }
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

  /** HLL-shaped distinct sketch over a string column: 16^hexChars
    * registers (max-rho), elementwise-max merge — a pure function of
    * the input SET. See [[HllAgg]]. */
  def hllSketch(item: Column, hexChars: Int): Column =
    GraftBridge.column(
      HllAgg(GraftBridge.expression(item), hexChars).toAggregateExpression())

  /** The raw HLL estimate of a register array, as the deterministic
    * IEEE chain both engines replay identically: ascending-index
    * sequential fold of the EXACT doubles 1/2^reg (looked up from a
    * 53-entry literal of exactly-representable powers of two — no libm
    * anywhere), then alpha_m·m²/S with alpha_m = 0.7213/(1 + 1.079/m)
    * spelled in that op order. The oracle's `1/(1::BIGINT << r)` lands
    * on the identical exact doubles. */
  def hllEstimate(registers: Column, hexChars: Int): Column = {
    val m = 1 << (4 * hexChars)
    val inv = typedlit((0 to 52).map(i => 1.0 / (1L << i).toDouble))
    val s = aggregate(registers, lit(0.0),
      (acc, r) => acc + element_at(inv, r.cast("int") + lit(1)))
    lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
      lit(m.toDouble) * lit(m.toDouble) / s
  }

  /** The HLL estimate read off RELATIONALLY-MERGED register cells — an
    * array of (idx, r) structs as produced by
    * `posexplode(sk) → groupBy(idx).agg(max(r)) → collect_list(struct)`.
    * THE one definition of the order-sensitive readout (sort by idx
    * BEFORE the float fold — a different order rounds differently), so
    * the q_sketch_hll 'ALL' row, q_sketch_hll_rolling,
    * `Warehouse.uniquesOverRange` and the scale probes can never
    * drift. */
  def hllEstimateFromCells(cells: Column, hexChars: Int): Column =
    hllEstimate(transform(array_sort(cells), _.getField("r")), hexChars)

  /** Count of non-zero registers in the same merged-cell shape — the
    * n_hit honesty column next to [[hllEstimateFromCells]]. */
  def hllHitsFromCells(cells: Column): Column =
    size(filter(cells, x => x.getField("r") > lit(0)))

  /** Dyadic Count-Min sketch aggregate over a long column in
    * [0, 2^levels): levels*depth*4096 longs, row-major by
    * (level, depth-row). See [[DyadicCmsAgg]]. */
  def dyadicCountMin(value: Column, levels: Int, depth: Int): Column =
    GraftBridge.column(
      DyadicCmsAgg(GraftBridge.expression(value), levels, depth)
        .toAggregateExpression())

  /** The dyadic decomposition of [0, x]: the (level, prefix) nodes whose
    * disjoint union is exactly {0..x} — at most `levels` of them, one
    * per set bit of x+1 (prefix = the bits of x+1 above that level,
    * re-based to the level). Shared by the relational readout, the
    * generated oracle and [[dyadicRank]], so the three can never
    * disagree on the decomposition. */
  def dyadicNodes(x: Long, levels: Int): Seq[(Int, Long)] = {
    // x < (1L << levels), NOT x + 1 <= ...: at x = Long.MaxValue the
    // +1 wraps negative and the guard would fail OPEN, silently
    // returning an empty decomposition
    require(x >= -1 && x < (1L << levels),
      s"dyadicNodes: x=$x outside [-1, 2^$levels - 1]")
    val y = x + 1
    // the full domain: y = 2^levels has its single set bit ABOVE the
    // stored levels — it is the union of the two level-(levels-1) halves
    if (y == (1L << levels)) Seq((levels - 1, 0L), (levels - 1, 1L))
    else (0 until levels).filter(l => ((y >>> l) & 1L) == 1L)
      .map(l => (l, (y >>> (l + 1)) << 1))
  }

  /** Flat cell index of a dyadic node's depth-row d — the aggregate's
    * internal addressing exposed for RELATIONAL readouts over an
    * exploded sketch (0-based, matching posexplode positions; add 1
    * for element_at). Deterministic md5, identical to the aggregate's
    * update path. */
  def dyadicCellIndex(level: Int, prefix: Long, d: Int, depth: Int): Int =
    level * depth * CountMinAgg.Width + d * CountMinAgg.Width +
      SketchHash.bucket12(d, s"$level|$prefix")

  /** rank(x) = estimated #{v <= x} from a collected dyadic sketch:
    * Σ over decomposition nodes of (min over depth rows). Never
    * underestimates. */
  def dyadicRank(sketch: IndexedSeq[Long], levels: Int, depth: Int,
                 x: Long): Long = {
    val width = CountMinAgg.Width
    if (x < 0) return 0L
    dyadicNodes(math.min(x, (1L << levels) - 1), levels).map {
      case (l, p) =>
        (0 until depth).map(d => sketch(l * depth * width + d * width +
          SketchHash.bucket12(d, s"$l|$p"))).min
    }.sum
  }

  /** Smallest x whose estimated rank reaches ceil(q·n) — the quantile
    * readout of a dyadic sketch, one binary search over the domain
    * against [[dyadicRank]] (driver-side arithmetic on the collected
    * ≈1.6 MiB artifact; no data pass). Because rank estimates never
    * underestimate, the returned x can only sit AT or BELOW the exact
    * q-quantile, by at most the CMS overcount converted through the
    * local value density. */
  def dyadicQuantile(sketch: IndexedSeq[Long], levels: Int, depth: Int,
                     n: Long, q: Double): Long = {
    require(q > 0.0 && q <= 1.0, s"dyadicQuantile: q=$q")
    require(n > 0, s"dyadicQuantile: n=$n")
    val target = math.ceil(q * n).toLong
    var lo = 0L
    var hi = (1L << levels) - 1
    while (lo < hi) {
      val mid = lo + (hi - lo) / 2
      if (dyadicRank(sketch, levels, depth, mid) >= target) hi = mid
      else lo = mid + 1
    }
    lo
  }
}
