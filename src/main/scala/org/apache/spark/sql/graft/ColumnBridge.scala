package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Spark surfaces (Spark 4 wraps Columns in
  * ColumnNodes; ExpressionUtils is the blessed adapter but is
  * sql-private). The only reach into Spark internals in this codebase;
  * everything else is public API. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Non-blocking read of an Observation's metrics (the *OrEmpty getters
    * are sql-private; `get` blocks forever when the observed plan was never
    * materialized — the failure mode ConnectedComponents guards against).
    * Built on getRowOrEmpty, not getOrEmpty: the latter NPEs on the
    * schema-less empty Row it substitutes when metrics are pending. */
  def metricsOrEmpty(obs: org.apache.spark.sql.Observation): Map[String, Any] =
    obs.getRowOrEmpty match {
      case Some(row) if row.schema != null =>
        row.schema.fieldNames.iterator.zip(row.toSeq.iterator).toMap
      case _ => Map.empty
    }

  /** Test seam: materialize a SparkSessionExtensions' injected functions
    * into a registry (the real injection happens at session build, which
    * needs a fresh SparkContext — unavailable inside a shared-context
    * test suite). */
  def registerFunctions(ext: org.apache.spark.sql.SparkSessionExtensions,
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(reg)
}
