package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` surface needed to wrap a custom
  * Catalyst Expression as a user-facing Column in Spark 4 (Column no
  * longer exposes a public Expression constructor). Lives in the
  * org.apache.spark.sql package on purpose — the same technique Spark
  * connector/extension libraries use.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
