package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 hides the Column ⇄ catalyst Expression bridge behind
  * `private[sql]`; custom Catalyst expressions (SURVEY §2.12 step 3)
  * need it to surface as Columns. This sub-package of
  * `org.apache.spark.sql` re-exports the two conversions — the same
  * access pattern third-party Spark extensions use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
