package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the standard
  * first step of web-corpus text cleaning (CCNet normalizes before
  * hashing; C4-style dedup keys must not distinguish "é" from
  * "e"+U+0301, or every decomposed re-crawl of a page defeats exact and
  * span dedup alike). Spark ships no unicode-normalization function, so
  * the alternatives are a Scala UDF (serialization detour, opaque to
  * codegen spans) or this: a `UnaryExpression` whose `doGenCode` emits
  * a call on the reference object (the `BpeEncode`/`RegExpExtract`
  * pattern — the ICU-style algorithm is data-dependent, inlining buys
  * nothing), staying inside whole-stage codegen.
  *
  * Composition contract: apply BEFORE [[graft.operators.Dedup]]
  * fingerprints/shingles so canonically-equivalent texts collide; the
  * DuckDB oracle mirrors via `nfc_normalize`. Null → null; already-NFC
  * strings pass through unchanged (idempotence spec-pinned).
  */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires STRING input, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  /** Public for generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // the common case (ASCII / already-composed) allocates nothing
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }

  override protected def nullSafeEval(v: Any): Any =
    normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.normalize($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object UnicodeExpressions {
  /** Column form of [[NfcNormalize]]. */
  def nfc(text: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(text)))
}
