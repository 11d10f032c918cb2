package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the Column ↔ Expression conversions, which Spark 4
  * keeps private[sql] (pre-4.0 code did `new Column(expr)`). Lives inside
  * the org.apache.spark.sql package tree solely to access them; no Spark
  * internals are modified. */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
