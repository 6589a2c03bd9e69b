package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge.
  *
  * Spark 4 made `Column` implementation-agnostic (ColumnNode), so user
  * code can no longer write `new Column(expr)`. The supported escape
  * hatch for libraries shipping native expressions is
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`; this one-file subpackage re-exports just the two
  * conversions the engine needs.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a builder in an EXISTING session's function registry
    * (sessionState is private[sql]); for builder-time injection use
    * [[graft.GraftExtensions]] instead.
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
