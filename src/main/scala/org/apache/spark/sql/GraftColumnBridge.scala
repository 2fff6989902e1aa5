package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters — the
  * supported escape hatch for libraries shipping custom Catalyst
  * expressions without a full FunctionRegistry round-trip. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree into catalyst expressions via
    * the active session's converter. `expression` returns a LAZY
    * ColumnNodeExpression wrapper, which the analyzer will not recurse
    * into when the tree is produced by a FunctionRegistry builder —
    * this form converts to plain (possibly Unresolved*) catalyst nodes
    * the analyzer handles normally. */
  def resolvedExpression(c: Column): Expression =
    SparkSession.getActiveSession match {
      case Some(s: org.apache.spark.sql.classic.SparkSession) => s.expression(c)
      case _ => ExpressionUtils.expression(c)
    }
}
