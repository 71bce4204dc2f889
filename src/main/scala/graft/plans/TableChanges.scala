package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{Catalog, SnapshotLog}

/** `graft_table_changes('<view-or-path>', fromVersion [, toVersion])` —
  * the change-data-feed TABLE FUNCTION (Delta's `table_changes`):
  * SQL-side access to the materialized per-commit feed under
  * `table/_cdf/` (typed `change_type` rows + `_commit_version`),
  * registered through `SparkSessionExtensions.injectTableFunction`.
  *
  * The feed is the one [[SnapshotLog]] writes AT COMMIT TIME from the
  * affected partitions only — this function adds no second diff
  * implementation, it just scans the already-materialized parquet and
  * version-filters it (the `_commit_version` predicate prunes whole
  * version directories via partition-style file pruning on the scan).
  * The first argument resolves through the DML view registry when the
  * name is registered, and is otherwise taken as a table path — the
  * same resolution order a user expects from the DML verbs. */
object TableChanges {

  private def strArg(e: Expression): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case Literal(v, _) if v != null => v.toString
    case other =>
      sys.error(s"graft_table_changes expects a literal table name, got $other")
  }

  private def longArg(e: Expression): Long = e match {
    case Literal(v: java.lang.Integer, _) => v.toLong
    case Literal(v: java.lang.Long, _) => v
    case other =>
      sys.error(s"graft_table_changes expects a literal version, got $other")
  }

  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 2 || exprs.size == 3,
      "graft_table_changes(table, fromVersion [, toVersion])")
    val spark = SparkSession.active
    val name = strArg(exprs.head)
    val from = longArg(exprs(1))
    val to = if (exprs.size == 3) longArg(exprs(2)) else Long.MaxValue
    val base = Catalog.dmlTarget(name).map(_._1).getOrElse(name)
    val feed = SnapshotLog.readCdf(spark, base).getOrElse(
      sys.error(s"no materialized change feed under $base/_cdf " +
        "(write the table with writeCdf = true, or repairCdf to backfill)"))
    feed.filter(col("_commit_version") >= from &&
        col("_commit_version") <= to)
      .queryExecution.logical
  }
}
