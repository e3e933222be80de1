package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion for the graft
  * library's native Catalyst expressions (Spark 4 moved `Column.expr`
  * behind `classic.ExpressionUtils`). Standard extension-library pattern:
  * one object in the `org.apache.spark.sql` package, nothing else.
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a Catalyst expression.
    * `toExpression` merely wraps the node (`ColumnNodeExpression`), which
    * the analyzer converts only on plans built through the classic
    * Dataset API — a FunctionRegistry builder must hand the analyzer a
    * real expression tree (e.g. `ScalaUDF` for a UDF-applied column), so
    * run the standalone converter here. */
  def convert(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
