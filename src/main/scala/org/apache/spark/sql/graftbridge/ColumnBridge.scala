package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's public `Column` is a Connect-compatible node wrapper and no
  * longer exposes `.expr`; the classic conversions live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` — hence this shim inside the `org.apache.spark.sql`
  * package tree (the established pattern for Spark extension libraries).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
