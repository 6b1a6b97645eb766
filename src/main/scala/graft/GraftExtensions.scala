package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.VectorExpressions

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — SQL then sees
  * `graft_dot_f32(a, b)` alongside the built-ins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorExpressions.dotF32FunctionDescription)
  }
}
