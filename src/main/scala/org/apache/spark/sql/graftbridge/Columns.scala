package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters —
  * Spark 4 routes Column construction through ColumnNode, and the
  * public surface offers no way to wrap a custom Catalyst Expression
  * that carries a non-literal constructor argument (e.g.
  * [[graft.functions.BloomContains]]'s pre-built Bloom filter — the
  * SQL-function registration path used by `graft_normalize` et al.
  * can only receive literals). The `ListenerFlush` pattern: one tiny
  * named seam instead of scattered package-name tricks.
  */
object Columns {
  def of(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
