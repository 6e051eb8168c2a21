package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression conversion (Spark 4.x
  * moved it behind `org.apache.spark.sql.classic.ExpressionUtils`).
  * Lives in a subpackage of `org.apache.spark.sql` solely to satisfy
  * the access modifier; keep this file free of any logic.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
