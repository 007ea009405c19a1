package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` helpers: converting a custom Catalyst
  * `Expression` to/from a user-facing `Column` (Spark 4 routes Columns
  * through ColumnNodes; `ExpressionUtils` is the classic-session adapter).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `org.apache.spark.sql.types.AbstractDataType` is `private[sql]` in
    * its Scala signature (public bytecode); re-exposed so custom
    * expressions can declare `ExpectsInputTypes.inputTypes` and get
    * analysis-time type errors instead of executor ClassCastExceptions. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
