package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge. Spark 4 hides the classic
  * converters behind `private[sql]`; libraries that ship native
  * expressions (as graft does for hot-path array math) need this thin
  * re-export, placed in an org.apache.spark.sql subpackage for access.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
