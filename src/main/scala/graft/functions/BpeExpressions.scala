package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenization in ONE expression: whitespace-split the input,
  * greedily apply a trained merge table (lowest rank first — the
  * standard encode order, which replays the training order) to each
  * word, concatenate the per-word token streams.
  *
  * Why an Expression: the composed alternative is one HOF fold per
  * merge — a plan tree linear in the merge count (hundreds to tens of
  * thousands for a real tokenizer) that lands on both sides of any
  * later join, the same failure mode that motivated `NearestCentroid`
  * and `PqEncodeL2`. Here the merge table is a codegen reference
  * object and the plan stays constant-size.
  *
  * Codegen note: `doGenCode` emits a CALL to [[encodeText]] on the
  * reference object (the `RegExpExtract` pattern — the algorithm is
  * data-dependent-iterative, so inlining it buys nothing), keeping the
  * operator inside whole-stage codegen spans without a UDF's
  * serialization detour.
  *
  * Null contract: null text → null; empty text → empty array. Merge
  * application is leftmost-first non-overlapping per pass, matching
  * `Bpe.mergeFold`'s sequential fold — the differential spec pins
  * train→encode round-tripping against a driver-side reference.
  */
case class BpeEncode(child: Expression, merges: Array[(String, String)])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode requires STRING input, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  /** rank lookup keyed `left right` (a space separator cannot occur
    * inside a symbol: symbols come from whitespace-split words). */
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      val key = merges(i)._1 + " " + merges(i)._2
      // first (lowest) rank wins if a pair is listed twice
      if (!m.containsKey(key)) m.put(key, i)
      i += 1
    }
    m
  }

  /** Public for generated code. */
  def encodeText(s: UTF8String): ArrayData = {
    val words = s.toString.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) encodeWord(words(w), out)
      w += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def encodeWord(word: String,
                         out: scala.collection.mutable.ArrayBuffer[UTF8String])
      : Unit = {
    // codepoint-wise initial symbols (surrogate pairs stay whole)
    var syms = {
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val n = Character.charCount(cp)
        b += word.substring(i, i + n)
        i += n
      }
      b
    }
    var done = merges.isEmpty
    while (!done && syms.length >= 2) {
      // lowest-rank applicable pair this pass
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r) = merges(best)
        val next = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            next += l + r; j += 2 // leftmost-first, non-overlapping
          } else { next += syms(j); j += 1 }
        }
        syms = next
      }
    }
    syms.foreach(t => out += UTF8String.fromString(t))
  }

  override protected def nullSafeEval(v: Any): Any =
    encodeText(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.encodeText($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncode = copy(child = newChild)
}

object BpeExpressions {
  /** Column form of [[BpeEncode]]. */
  def bpeEncode(text: Column, merges: Array[(String, String)]): Column =
    GraftBridge.column(
      BpeEncode(GraftBridge.expression(text), merges))
}
