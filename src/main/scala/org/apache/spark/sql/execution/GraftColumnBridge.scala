package org.apache.spark.sql.execution

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the library's programmatically-built
  * Catalyst expressions (bloom sketches and probes in
  * [[graft.operators.BloomJoin]]). Spark 4 wraps Columns around internal
  * `ColumnNode`s and keeps the converter (`ExpressionUtils`)
  * `private[sql]`; this shim lives in `org.apache.spark.sql.execution`
  * for the same reason [[GraftStatsBarrier]] does — it re-exports exactly
  * the two public-shaped conversions and nothing else.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
