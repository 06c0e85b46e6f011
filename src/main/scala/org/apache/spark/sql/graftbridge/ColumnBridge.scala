package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge.
  *
  * Spark 4 moved the classic Column internals behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); a library shipping its
  * own Catalyst expressions needs this one-hop bridge living inside the
  * `org.apache.spark.sql` package to lift them into user-facing Columns —
  * the standard pattern for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
