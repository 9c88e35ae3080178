package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression

/** Companion shim to [[org.apache.spark.sql.graftbridge.Bridge]]:
  * `ColumnNodeExpression` and its converter are `private[classic]`, so
  * the unwrap step has to live in this package. */
object GraftClassicBridge {
  /** Unwrap a lazy ColumnNode shim into the real catalyst tree; other
    * expressions pass through. */
  def toCatalyst(e: Expression): Expression = e match {
    case cne: ColumnNodeExpression => ColumnNodeToExpressionConverter(cne.node)
    case other => other
  }
}
