package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge.
  *
  * Spark 4 unified the Column API over ColumnNode and made the
  * conversion helpers `private[sql]`; graft needs them to rewrite
  * attribute references (JoinedFrame right-side renames) and to build
  * custom Catalyst expressions. Living under org.apache.spark.sql is
  * the standard extension-library pattern (same approach as public
  * connectors, e.g. spark-cassandra-connector / frameless).
  */
object Bridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
