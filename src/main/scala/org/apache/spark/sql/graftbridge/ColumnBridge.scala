package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge for Spark 4's unified Column API.
  *
  * `ExpressionUtils` is `private[sql]`, so custom-expression libraries host
  * this two-liner inside an `org.apache.spark.sql` subpackage — the same
  * technique used by public Spark extension projects.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
