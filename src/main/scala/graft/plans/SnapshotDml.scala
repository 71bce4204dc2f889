package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Assignment, DeleteFromTable, LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{BooleanType, LongType, StringType}

import graft.sources.{Catalog, SnapshotLog}

/** SQL DML on commit-log tables — `DELETE FROM <view> WHERE …` and
  * `UPDATE <view> SET … WHERE …` — via the session-extension seam the
  * engine already owns ([[graft.GraftExtensions]]).
  *
  * Spark reserves v2 DML plans (`DeleteFromTable`/`UpdateTable`) for
  * DSv2 catalog tables; a DSv2 read path, however, cannot reuse the
  * planner-integrated `HadoopFsRelation` and delegating to Spark's
  * internal parquet v2 table would bypass deletion vectors — SELECT
  * through such a catalog would resurrect deleted rows. So DML takes
  * this route instead: a resolution rule intercepts the logical DML
  * node while its target is still the registered snapshot VIEW, and
  * rewrites it into a runnable command that executes
  * [[SnapshotLog.deleteWhere]] (merge-on-read deletion vectors; the
  * partition-predicate metadata fast path still short-circuits
  * inside) or [[SnapshotLog.updateWhere]], then RE-PINS the view at
  * the committed version so a follow-up SELECT on the same name sees
  * the new snapshot. The SELECT surface stays the DV-correct,
  * manifest-pruned relation it already was.
  *
  * Conditions/assignments cross from the parsed plan into the Column
  * API via `Expression.sql` round-trips — exact for the predicate
  * grammar DML uses (column refs, literals, comparisons, boolean
  * algebra, arithmetic, function calls). */
case class SnapshotDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The view name a DML target resolves to, before or after Spark's
    * own relation resolution (rule order inside the analyzer batch is
    * not ours to pick, so match both shapes). */
  private def viewNameOf(table: LogicalPlan): Option[String] = table match {
    case u: UnresolvedRelation if u.multipartIdentifier.size == 1 =>
      Some(u.multipartIdentifier.head)
    case SubqueryAlias(ident, _) => Some(ident.name)
    case _ => None
  }

  /** SQL text of `e` with attribute QUALIFIERS stripped: by the time
    * this rule fires, the analyzer may have resolved `id` to
    * `dml_t1.id` against the view — but the text re-parses inside the
    * DML executor against the bare table frame, where qualified names
    * cannot resolve. The column NAME is the cross-plan contract. */
  private def bareSql(e: Expression): String = e.transform {
    case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    case u: UnresolvedAttribute => UnresolvedAttribute(Seq(u.nameParts.last))
  }.sql

  private def keyName(k: Expression): String = k match {
    case a: UnresolvedAttribute => a.nameParts.last
    case a: Attribute => a.name
    case other => other.sql.stripPrefix("`").stripSuffix("`")
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case DeleteFromTable(t, cond) if viewNameOf(t).exists(Catalog.dmlTarget(_).isDefined) =>
      SnapshotDeleteCommand(viewNameOf(t).get, bareSql(cond))
    case UpdateTable(t, assignments, cond)
        if viewNameOf(t).exists(Catalog.dmlTarget(_).isDefined) =>
      val set = assignments.map {
        case Assignment(k, v) => keyName(k) -> bareSql(v)
      }
      SnapshotUpdateCommand(viewNameOf(t).get, set,
        cond.map(bareSql).getOrElse("true"))
    case _ => plan
  }
}

private object SnapshotDml {
  val output: Seq[Attribute] = Seq(
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("metadata_only", BooleanType, nullable = false)(),
    AttributeReference("n_dropped_partitions", LongType, nullable = false)(),
    AttributeReference("n_rewritten_partitions", LongType, nullable = false)())

  /** After a commit, re-pin the view so name-based readers see the new
    * version (the crawler-refresh model, applied transactionally). */
  def repin(spark: SparkSession, view: String): Unit =
    Catalog.dmlTarget(view).foreach { case (path, pc, db, name) =>
      Catalog.registerSnapshotLog(spark, db, name, path, Some(pc))
    }
}

case class SnapshotDeleteCommand(view: String, condSql: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = SnapshotDml.output
  override def run(spark: SparkSession): Seq[Row] = {
    val (path, partCol, _, _) = Catalog.dmlTarget(view).getOrElse(
      sys.error(s"$view is not a registered snapshot-DML target"))
    val out = SnapshotLog.deleteWhere(spark, path, expr(condSql), partCol,
      deletionVectors = true).getOrElse(
      sys.error(s"$view has no committed version"))
    SnapshotDml.repin(spark, view)
    Seq(Row("DELETE", out.version, out.metadataOnly,
      out.droppedPartitions.size.toLong, out.rewrittenPartitions.size.toLong))
  }
}

case class SnapshotUpdateCommand(
    view: String, set: Seq[(String, String)], condSql: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = SnapshotDml.output
  override def run(spark: SparkSession): Seq[Row] = {
    val (path, partCol, _, _) = Catalog.dmlTarget(view).getOrElse(
      sys.error(s"$view is not a registered snapshot-DML target"))
    val out = SnapshotLog.updateWhere(spark, path, expr(condSql),
      set.map { case (k, v) => k -> expr(v) }.toMap, partCol).getOrElse(
      sys.error(s"$view has no committed version"))
    SnapshotDml.repin(spark, view)
    Seq(Row("UPDATE", out.version, out.metadataOnly,
      out.droppedPartitions.size.toLong, out.rewrittenPartitions.size.toLong))
  }
}
