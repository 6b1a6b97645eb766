package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{TextAnalysis, VectorExpressions}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expression and SQL forms of its text functions. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — SQL then sees
  * `graft_dot_f32(a, b)`, `graft_fingerprint(text)`,
  * `graft_redact_pii(text)`, `graft_normalize_text(text)`,
  * `graft_nfc(text)` alongside the built-ins, so the pure-SQL surface
  * (`spark.sql(...)`) reaches the same operators the Column API does.
  *
  * The text functions compose built-ins as UnresolvedFunction trees (the
  * analyzer resolves them in place, including implicit casts) — a
  * Column→Expression bridge does NOT work here: in Spark 4 it yields
  * ColumnNodeExpression wrappers that stay unevaluable when spliced
  * through a function builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args, isDistinct = false)

  /** Same composition as Dedup.normalizeText / TextAnalysis.normText. */
  private def normalizeExpr(c: Expression): Expression =
    fn("lower", fn("trim",
      fn("regexp_replace", c, Literal("\\s+"), Literal(" "))))

  /** Same chain as TextAnalysis.redactPii (email → IP → phone). */
  private def redactExpr(c: Expression): Expression =
    fn("regexp_replace",
      fn("regexp_replace",
        fn("regexp_replace", c,
          Literal(TextAnalysis.emailPattern), Literal("<EMAIL>")),
        Literal(TextAnalysis.ipv4Pattern), Literal("<IP>")),
      Literal(TextAnalysis.phonePattern), Literal("<PHONE>"))

  private def register(name: String, arity: Int)
                      (build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (children: Seq[Expression]) => {
        require(children.size == arity,
          s"$name takes $arity argument(s), got ${children.size}")
        build(children)
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorExpressions.dotF32FunctionDescription)
    ext.injectFunction(VectorExpressions.lshBucketsFunctionDescription)
    ext.injectFunction(register("graft_fingerprint", 1)(
      cs => fn("md5", normalizeExpr(cs.head))))
    ext.injectFunction(register("graft_redact_pii", 1)(
      cs => redactExpr(cs.head)))
    ext.injectFunction(register("graft_normalize_text", 1)(
      cs => normalizeExpr(cs.head)))
    // native expressions, not compositions — splice them in directly
    ext.injectFunction(register("graft_nfc", 1)(
      cs => graft.functions.NfcNormalize(cs.head)))
    ext.injectFunction(register("graft_jaro_winkler", 2)(
      cs => graft.functions.JaroWinkler(cs(0), cs(1))))
    // sketch AGGREGATES: the builder returns the bare AggregateFunction
    // and the analyzer wraps it in an AggregateExpression, exactly as
    // for built-in aggregates — SQL then runs the same mergeable
    // sketches the Column API does (size parameters must be integer
    // literals: they fix the aggregation buffer layout at plan time)
    ext.injectFunction(register("graft_hll_sketch", 2)(cs =>
      graft.functions.HllAgg(cs.head,
        intLit("graft_hll_sketch", "hexChars", cs(1)))))
    ext.injectFunction(register("graft_count_min", 2)(cs =>
      graft.functions.CountMinAgg(cs.head,
        intLit("graft_count_min", "depth", cs(1)))))
    ext.injectFunction(register("graft_misra_gries", 2)(cs =>
      graft.functions.MisraGriesAgg(cs.head,
        intLit("graft_misra_gries", "k", cs(1)))))
  }

  private def intLit(fname: String, pname: String, e: Expression): Int =
    e match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fname: $pname must be an INTEGER literal, got $other")
    }
}
