package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Expression bridge. Spark 4 hides the classic converters as
 * `private[sql]`; this shim lives under `org.apache.spark.sql` purely to
 * re-export them to the graft packages (the standard pattern for
 * libraries providing custom Catalyst expressions).
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
