package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{GraftChangeFeedTable, GraftSnapshotTable}

/** The Delta-style v2→v1 substitution that makes [[graft.sources.GraftCatalog]]
  * readable: every `DataSourceV2Relation` over a [[GraftSnapshotTable]]
  * is replaced — during resolution, before any capability check — with
  * the table's planner-integrated, DV-correct v1 plan
  * ([[graft.sources.SnapshotRelation]]: manifest-pruned
  * `FileSourceScanExec`, deletion-vector anti-join, column-mapping
  * rename, bucketed output partitioning). See the finding on
  * [[graft.sources.GraftCatalog]] for why a native DSv2 `Scan` (or
  * `V1Scan`) cannot carry those semantics.
  *
  * Each occurrence substitutes a FRESH plan (new exprIds), then projects
  * it onto the v2 relation's own attribute ids — downstream references
  * and self-joins resolve unchanged. */
case class GraftCatalogRelationRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSnapshotTable] =>
      val tbl = r.table.asInstanceOf[GraftSnapshotTable]
      align(r, tbl.base, tbl.dvCorrectPlan(spark).queryExecution.analyzed)
    // the batch change feed (readChangeFeed option): same substitution
    // shape over the ranged feed read
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftChangeFeedTable] =>
      val tbl = r.table.asInstanceOf[GraftChangeFeedTable]
      align(r, tbl.base, tbl.feedPlan(spark).queryExecution.analyzed)
  }

  private def align(
      r: DataSourceV2Relation, base: String, v1: LogicalPlan): LogicalPlan = {
    val resolver = spark.sessionState.conf.resolver
    val aligned = r.output.map { a =>
      val src = v1.output.find(o => resolver(o.name, a.name)).getOrElse(
        throw new IllegalStateException(
          s"$base: column '${a.name}' in the resolved catalog schema " +
            s"is missing from the substituted plan (${v1.output.map(_.name).mkString(", ")})"))
      Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
    }
    Project(aligned, v1)
  }
}
