package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal visibility bridge: `ExpressionUtils` is `private[sql]` in Spark
  * 4.x, so Column↔Expression conversion for custom Catalyst expressions is
  * exposed to the graft library through this in-namespace shim (the standard
  * Spark-extension-library pattern). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
