package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor (Spark Connect
  * split); the classic converter is `private[sql]`. This bridge lives inside
  * the `org.apache.spark.sql` namespace to expose the two conversions the
  * engine's native expressions need. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a raw LogicalPlan (classic `Dataset.ofRows` is
    * `private[sql]`) — needed to surface custom logical operators.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `AbstractDataType`/`TypeCollection` are `private[sql]`; expressions in
    * graft.plans declare `ExpectsInputTypes` contracts through these
    * aliases.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
  def typeCollection(ts: org.apache.spark.sql.types.DataType*): AbstractType =
    org.apache.spark.sql.types.TypeCollection(ts: _*)
}
