package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 routed `Column` through ColumnNode (Connect-compatible), so
  * wrapping a custom Expression needs the classic converters, which are
  * `private[sql]` — this shim, living under `org.apache.spark.sql`,
  * re-exports just the two conversions the engine needs. No Spark
  * internals are modified.
  */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
