package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 re-based `Column` on the connect-compatible `ColumnNode` tree
  * and made the classic conversions (`classic.ExpressionUtils`)
  * `private[sql]`. graft's data-skipping reader
  * ([[graft.pipeline.DataSkipping]]) analyzes user predicates as Catalyst
  * expressions to rewrite them into stats-manifest predicates — exactly
  * what Delta's data-skipping reader does, and it sits inside
  * `org.apache.spark.sql` for the same reason. This object is the entire
  * private-API surface the repo touches, kept in one place on purpose.
  */
object GraftColumnBridge {
  /** The Catalyst expression behind a (classic-session) Column. */
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Wrap a Catalyst expression back into a Column. */
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
