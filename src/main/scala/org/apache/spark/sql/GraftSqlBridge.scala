package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column <-> Expression converters,
  * so graft's custom Catalyst expressions can be exposed as `Column`s.
  * This is the documented extension-point pattern for classic-mode Spark
  * (see `org.apache.spark.sql.classic.ClassicConversions`). */
object GraftSqlBridge {
  def column(e: Expression): Column =
    classic.ClassicConversions.ColumnConstructorExt(Column).apply(e)
  def expression(c: Column): Expression =
    classic.ColumnConversions.expression(c)
}
