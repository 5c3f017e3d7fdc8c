package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `Column` a ColumnNode
  * wrapper and hid the classic conversions behind `private[sql]`;
  * custom Catalyst expressions (graft.functions.*) still need them, so
  * this lives inside the `org.apache.spark.sql` package tree — the
  * established pattern for Spark-native extension libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
