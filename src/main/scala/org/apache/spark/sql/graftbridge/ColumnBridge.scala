package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression conversions for graft's custom Catalyst
  * expressions. Spark 4 made `ExpressionUtils` private[sql], so this
  * one-file bridge lives in the org.apache.spark.sql namespace — the
  * established pattern for libraries that ship native expressions
  * without a SparkSessionExtensions registration requirement. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
