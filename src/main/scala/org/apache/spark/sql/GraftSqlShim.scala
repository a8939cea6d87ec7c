package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal access shim for graft's custom Catalyst expressions.
  *
  * Spark 4's unified `Column` no longer exposes its Catalyst expression
  * publicly (`Column.expr` is gone; the classic bridge
  * `org.apache.spark.sql.classic.ExpressionUtils` and
  * `types.AbstractDataType` are `private[sql]`). This object — compiled
  * into the `org.apache.spark.sql` package from this repo — re-exports
  * exactly the two lift functions and the input-type supertype needed to
  * define codegen'd expressions outside Spark's own tree. No Spark
  * internals are modified; this is the conventional integration point
  * used by expression libraries targeting the classic engine.
  */
object GraftSqlShim {
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** Lift a Catalyst expression into a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Recover the Catalyst expression backing a classic Column. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
