package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> Expression converters (Spark 4
  * wraps Columns in ColumnNodes; ExpressionUtils is the blessed adapter
  * but is sql-private). The only reach into Spark internals in this
  * codebase; everything else is public API. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Test seam: materialize a SparkSessionExtensions' injected functions
    * into a registry (the real injection happens at session build, which
    * needs a fresh SparkContext — unavailable inside a shared-context
    * test suite). */
  def registerFunctions(ext: org.apache.spark.sql.SparkSessionExtensions,
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(reg)
}
