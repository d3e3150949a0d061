package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.FloatVectorCosine

/** Session-extension entry point: registers the library's native
  * expressions at session build time —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)` on the builder), the
  * deployment-grade alternative to the per-session
  * `FloatVectorCosine.register` temp-function call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_cosine"),
     new ExpressionInfo(classOf[FloatVectorCosine].getName, "vec_cosine"),
     (exprs: Seq[Expression]) => FloatVectorCosine(exprs.head, exprs(1))))
}
