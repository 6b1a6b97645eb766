package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that declares itself NON-DETERMINISTIC so the
  * optimizer evaluates the wrapped expression exactly once per row.
  *
  * Why this exists (the Spark optimization guide's §4.4 pattern, applied
  * to an expensive built-in composition instead of a UDF): Catalyst
  * freely inlines a projected alias into every operator that references
  * it — predicate pushdown substitutes the full defining subtree into the
  * pushed filter, and `CollapseProject` merges projections when it deems
  * the expression cheap. For a scalar pipeline like the Urls tier, where
  * one logical value is a ~20-regexp composition, each inlining site
  * re-evaluates the whole chain per row (measured on `q_domain_gate`:
  * 8.3 s warm for the inlined plan vs 0.4 s with the barrier — see
  * OPTIMIZATION_r12.md). Marking the alias non-deterministic forbids both
  * rewrites, pinning ONE evaluation in the projection that defines it.
  *
  * The wrapped expression MUST actually be deterministic (this node only
  * lies to the optimizer to disable duplication): the value is still a
  * pure function of its row, so retries/replays are reproducible. The
  * trade-off is that it also blocks legitimate pushdown of OTHER
  * predicates past the projection — wrap only genuinely expensive
  * columns, never blanket (the guide's caveat, verbatim).
  */
case class ComputeOnce(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the whole point: never constant-folded, duplicated, or pushed through
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_compute_once"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(
      newChild: Expression): ComputeOnce = copy(child = newChild)
}

object ComputeOnce {
  /** Wrap a column so its defining expression is computed once per row. */
  def once(c: Column): Column =
    GraftBridge.column(ComputeOnce(GraftBridge.expression(c)))
}
