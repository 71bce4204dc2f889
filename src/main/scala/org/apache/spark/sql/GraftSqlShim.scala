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
}
