package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` session function registry, so graft's
  * expression builders can be registered on an EXISTING session (the
  * `spark.sql.extensions` config path only applies at session build
  * time). Same shim pattern as [[ColumnBridge]]. */
object FunctionBridge {
  def register(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
