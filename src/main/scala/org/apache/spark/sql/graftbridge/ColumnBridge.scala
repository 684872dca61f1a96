package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge to Spark 4's private[sql] Column <-> catalyst Expression
  * conversion, for exposing custom Catalyst expressions as Columns
  * (the supported extension surface is SparkSessionExtensions /
  * FunctionRegistry; this mirrors what `functions._` does internally).
  */
object ColumnBridge {
  def expr(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
}
