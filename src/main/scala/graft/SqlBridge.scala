package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression converters (Spark 4
  * moved Column onto ColumnNode; attaching a custom Catalyst Expression to
  * a Column needs these classic-API helpers). Lives in an
  * `org.apache.spark.sql` subpackage purely for access; contains no logic. */
object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-export of the `private[sql]` type that `inputTypes` overrides
    * must name (custom aggregates outside org.apache.spark.sql can't
    * reference it directly). */
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
}
