package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ClassicConversions, ExpressionUtils}

/** Bridge into Spark's `private[sql]` Column↔Expression plumbing —
  * the standard pattern for libraries shipping custom Catalyst
  * expressions on Spark 4 (the classic API keeps these internal since
  * the Connect split).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a raw logical plan (custom operators). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame = {
    import ClassicConversions.castToImpl
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)
  }

  /** Register an expression-backed SQL function on a session. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit = {
    import ClassicConversions.castToImpl
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
