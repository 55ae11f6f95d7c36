package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/**
 * Column ⇄ Expression bridge for Spark 4, where the conversion helpers are
 * `private[sql]`. Lives under org.apache.spark.sql so custom Catalyst
 * expressions (graft.functions.*) can surface as user-facing Columns — the
 * standard pattern for Spark extension libraries.
 */
object ColumnBridge {
  def column(e: Expression): Column = new Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
}

/** `Dataset.ofRows` bridge (also `private[sql]` in Spark 4): evaluate an
  * analyzed logical plan as a DataFrame — needed by graft's SQL DML
  * commands, which hold their source/query plans as fields. */
object DatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-plan a streaming micro-batch DataFrame as a BATCH frame over the
    * same physical rows (`internalCreateDataFrame` is `private[sql]`) — a
    * DSv1 Sink's input is an IncrementalExecution plan that batch writers
    * must not re-analyze; this is the standard sink idiom (the reference's
    * HoodieStreamingSink and Delta's sink do the same). */
  def unstream(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** The inverse of [[unstream]]: tag a batch DataFrame as streaming — a
    * DSv1 Source's getBatch must return `isStreaming = true` frames
    * (MicroBatchExecution asserts it; FileStreamSource uses the same
    * idiom). */
  def stream(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
