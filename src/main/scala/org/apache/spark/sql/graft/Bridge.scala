package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSession}

/** Bridges graft code to Spark-internal (`private[sql]`) APIs.
  *
  * Spark 4 moved `Column` to a backend-agnostic representation; building a
  * `Column` from a Catalyst [[Expression]] (needed for our custom codegen
  * expressions) goes through `classic.ExpressionUtils`, which is
  * `private[sql]` — hence this shim lives under `org.apache.spark.sql`.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a builder under `name` so the expression is usable from SQL. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  }

  /** Fresh empty function registry (for testing extension injection). */
  def emptyRegistry(): FunctionRegistry =
    new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry

  /** Apply a `SparkSessionExtensions`' injected functions to a registry —
    * what `BaseSessionStateBuilder` does at session build; `private[sql]`,
    * hence bridged here so specs can verify injection without building a
    * whole new session.
    */
  def applyExtensions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      registry: FunctionRegistry): Unit = {
    ext.registerFunctions(registry)
    ()
  }
}
