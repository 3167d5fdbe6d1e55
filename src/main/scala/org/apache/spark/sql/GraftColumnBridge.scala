package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the sql-private Column ↔ Expression converters —
  * the standard hook Spark-extension libraries use to expose custom
  * Catalyst expressions as user-facing Columns (the converters moved
  * behind `private[sql]` in Spark 4's Column-node API). Kept to two
  * one-liners so the private-API surface stays auditable. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
