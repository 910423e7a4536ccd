package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression converters.
  * Lives under `org.apache.spark.sql` solely to satisfy the access scope —
  * the standard technique for Spark extension libraries that expose custom
  * Catalyst expressions as user-facing `Column`s (Spark 4 moved the public
  * `new Column(expr)` constructor behind ColumnNode internals). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
