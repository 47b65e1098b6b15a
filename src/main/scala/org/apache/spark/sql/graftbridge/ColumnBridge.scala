package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the private[sql] Column ↔ Expression converters — the
  * supported way for extension libraries to lift custom Catalyst
  * expressions into the public Column API without going through the
  * function registry. Lives under org.apache.spark.sql.* solely for
  * access; contains no Spark-internal logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
