package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge over Spark 4's `private[sql]` Column↔Expression seam, for
  * the planning-time predicate inspection in `graft.table.GraftTable.where`
  * (dir-level data skipping reads the UNRESOLVED Catalyst tree — it never
  * executes it, so no resolution state is needed). */
object CatalystBridge {
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}
