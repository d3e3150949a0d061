package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 split the public `Column` from
  * catalyst and made the converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so third-party
  * native Expressions need this one-hop bridge inside the sql package
  * tree — the standard pattern for Spark-4 extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
