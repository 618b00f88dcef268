package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst [[Expression]]s and the public [[Column]]
  * API. Spark 4 backs Column by ColumnNode (connect-compatible), so
  * wrapping/unwrapping a Catalyst expression goes through the classic
  * `ExpressionUtils`, which is `private[sql]` — hence this shim lives
  * under `org.apache.spark.sql`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
