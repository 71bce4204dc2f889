package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Compile-time bridge to the one `private[sql]` seam the SQL-DML
  * executor needs: `classic.Dataset.ofRows`, the constructor for a
  * DataFrame over a captured logical plan (a MERGE statement's source
  * subtree). Living in `org.apache.spark.sql` — the standard placement
  * for Spark connectors that consume package-private planner surface —
  * replaces the previous `Class.forName` reflection: if the seam moves
  * in a future Spark, this fails at COMPILE time instead of at runtime
  * inside a user's MERGE statement.
  */
object GraftSqlShim {

  /** A DataFrame over `plan`, analyzed/executed by `spark`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A DataFrame over an `InternalRow` RDD — the `private[sql]`
    * constructor both ends of the streaming seam need: a v1 Source's
    * `getBatch` must hand MicroBatchExecution an `isStreaming = true`
    * frame (the engine asserts it), and a v1 Sink's `addBatch` receives
    * a streaming frame it must RE-ROOT as a batch (`isStreaming =
    * false`) one before any writer will accept it. Same seam Delta sits
    * on by living inside org.apache.spark.sql. */
  def internalDf(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
      schema: types.StructType,
      isStreaming: Boolean): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming)
}
