package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column↔Expression converters (Spark 4 made
  * Column API-agnostic; classic conversions are private[sql]). Minimal
  * surface: exactly what custom Catalyst expressions need to expose a
  * user-facing Column.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
