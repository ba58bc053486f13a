package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column⇄Expression converters so graft can
  * wrap its native Catalyst expressions as Columns (same technique as
  * other Spark extension libraries: a tiny shim in the spark.sql package
  * namespace).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Fully-converted Catalyst tree (ExpressionUtils.expression returns a
    * lazy ColumnNodeExpression wrapper for node-backed Columns, which
    * hides the real children from tree traversals — the converter
    * resolves the ColumnNode into genuine Catalyst expressions).
    */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
