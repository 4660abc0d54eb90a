package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed `Column.expr`/`new Column(expr)` from the public
  * API; the supported bridge (`classic.ExpressionUtils`) is
  * `private[sql]`. This shim lives inside the sql package purely to
  * re-expose the two conversions for graft's native expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Type equality ignoring nullability (DataType.sameType is
    * private[sql]). */
  def sameType(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = a.sameType(b)
}
