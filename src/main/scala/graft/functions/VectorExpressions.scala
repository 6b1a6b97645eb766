package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Custom Catalyst expression for the embedding hot path (SURVEY.md §2.11
  * upgrade path): a whole-stage-codegen'd float-array dot product.
  *
  * Why an Expression and not composition:
  *   - `aggregate(zip_with(...))` HOFs are evaluated interpreted (lambda
  *     dispatch + an intermediate array allocation per row);
  *   - a statically-unrolled element_at chain (Similarity.staticDot) is
  *     codegen'd but emits `dim` array accesses inline — fine at dim=64,
  *     but real embedding dims (768-4096) blow past JVM/codegen method
  *     sizes. `doGenCode` here emits ONE tight loop regardless of dim.
  *
  * Semantics: ascending-index sequential double sum — bit-identical to
  * the HOF fold, staticDot, and DuckDB's list_transform/list_sum oracle.
  * Array elements are assumed non-null (embedding vectors); the shorter
  * length wins if dims differ. Null input array → null result.
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot_f32 requires two ARRAY<FLOAT> inputs, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF32 =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column form of the codegen'd dot product. */
  def dotF32(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProductF32(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** (name, info, builder) triple for SparkSessionExtensions
    * .injectFunction — exposes `graft_dot_f32(a, b)` to SQL. */
  val dotF32FunctionDescription
      : (org.apache.spark.sql.catalyst.FunctionIdentifier, ExpressionInfo,
         Seq[Expression] => Expression) =
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot_f32"),
      new ExpressionInfo(classOf[DotProductF32].getName, "graft_dot_f32"),
      (children: Seq[Expression]) =>
        DotProductF32(children.head, children(1)))
}
