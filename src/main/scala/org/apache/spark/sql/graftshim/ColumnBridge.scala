package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved `Column.expr` behind the connect/classic split; the
  * supported classic converter (`ExpressionUtils`) is `private[sql]`.
  * This shim lives inside the `org.apache.spark.sql` package purely to
  * re-export the two conversion calls to our function layer — the usual
  * pattern for libraries that contribute native Catalyst expressions. */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
