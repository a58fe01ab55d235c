package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. `ExpressionUtils` is private[sql], so
  * this one-file subpackage of org.apache.spark.sql re-exports the two
  * conversions custom Catalyst expressions need — the established
  * pattern for Spark extension libraries. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
