package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.score.JaroWinklerExpr

/**
 * SparkSessionExtensions entry point — install with
 *   spark.sql.extensions=graft.GraftExtensions
 * (spark-submit / session builder). Injects the engine's native
 * expressions into the function registry at session build time, so SQL
 * users get the codegen'd implementations without any per-session
 * registration call.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
      (children: Seq[Expression]) => JaroWinklerExpr.build(children)))
  }
}
