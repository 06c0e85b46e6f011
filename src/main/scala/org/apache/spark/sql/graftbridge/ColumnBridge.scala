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

  /** Spark's own wrong-number-of-arguments AnalysisException
    * (`WRONG_NUM_ARGS.WITHOUT_SUGGESTION`, with error class and SQLSTATE),
    * for SQL-registered functions' arity guards — the error-factory
    * object is `private[sql]`, hence surfaced through this bridge.
    */
  def wrongNumArgs(name: String, expected: Int,
      actual: Int): Throwable =
    org.apache.spark.sql.errors.QueryCompilationErrors.wrongNumArgsError(
      name, Seq(expected), actual)

  /** The v1 catalog metadata behind a connector Table, when it is the
    * session catalog's `V1Table` wrapper (`private[sql]`) — how a
    * library's DML rule recognizes its own provider behind the v2
    * resolution path Spark uses for DELETE/UPDATE/MERGE targets.
    */
  def v1Table(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[org.apache.spark.sql.catalyst.catalog.CatalogTable] =
    t match {
      case v1: org.apache.spark.sql.connector.catalog.V1Table =>
        Some(v1.v1Table)
      case _ => None
    }

  /** A DataFrame over a resolved logical plan (`Dataset.ofRows` is
    * `private[sql]` in Spark 4) — what a library's RunnableCommand
    * needs to execute the query plan it carried through analysis
    * (Spark's own v1 `InsertIntoDataSourceCommand` does exactly this).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
