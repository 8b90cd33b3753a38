package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters.
  *
  * Spark 4 decoupled the public `Column` from catalyst `Expression`
  * (SPARK-46057); the blessed converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * A library shipping native catalyst expressions (graft.expr.*) needs
  * exactly these two calls, so this one-file shim lives inside the sql
  * package — the same technique other Spark-native OSS libraries use. No
  * other Spark internals are touched from here.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
