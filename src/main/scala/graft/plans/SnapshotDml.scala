package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Assignment, DeleteAction, DeleteFromTable, InsertStarAction, LogicalPlan,
  MergeAction, MergeIntoTable, SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, expr, lit}
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

  /** The registered view name a DML target resolves to, before or
    * after Spark's own relation resolution (rule order inside the
    * analyzer batch is not ours to pick, so match both shapes). Only
    * the INNERMOST name-bearing node counts — the relation itself
    * (unresolved), or the view's own SubqueryAlias once resolution
    * expanded it. A statement alias (`MERGE INTO v t …`) wraps an
    * OUTER SubqueryAlias; treating that as a candidate would let
    * `DELETE FROM other_tbl AS <registered-view>` hijack the DML
    * onto the wrong table, so aliases are never matched on their own. */
  private def viewNameOf(table: LogicalPlan): Option[String] = {
    def deepest(p: LogicalPlan): Option[String] = p match {
      case u: UnresolvedRelation if u.multipartIdentifier.size == 1 =>
        Some(u.multipartIdentifier.head)
      case _: UnresolvedRelation => None
      case SubqueryAlias(ident, child) => deepest(child).orElse(Some(ident.name))
      case _ => None
    }
    deepest(table).filter(Catalog.dmlTarget(_).isDefined)
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

  /** The merge keys when `cond` is a conjunction of same-named
    * column equalities (`t.k = s.k AND …`) — the canonical MERGE ON
    * shape. Any other shape returns None and the statement falls
    * through to Spark's own (v2-only) handling. */
  private def mergeKeys(cond: Expression): Option[Seq[String]] = {
    def name(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case a: Attribute => Some(a.name)
      case _ => None
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keys = conjuncts(cond).map {
      case EqualTo(l, r) =>
        (name(l), name(r)) match {
          case (Some(a), Some(b)) if a.equalsIgnoreCase(b) => Some(a)
          case _ => None
        }
      case _ => None
    }
    if (keys.exists(_.isEmpty) || keys.isEmpty) None
    else Some(keys.flatten.distinct)
  }

  /** The two MERGE shapes this engine executes directly:
    * UPDATE*+INSERT* (the upsert) and bare matched-DELETE. Clause
    * conditions and anything richer fall through to Spark. */
  private def mergeMode(
      matched: Seq[MergeAction], notMatched: Seq[MergeAction]): Option[Boolean] =
    (matched, notMatched) match {
      case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None))) =>
        Some(false) // upsert
      case (Seq(DeleteAction(None)), Seq()) => Some(true) // keyed delete
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case DeleteFromTable(t, cond) if viewNameOf(t).isDefined =>
      SnapshotDeleteCommand(viewNameOf(t).get, bareSql(cond))
    case UpdateTable(t, assignments, cond) if viewNameOf(t).isDefined =>
      val set = assignments.map {
        case Assignment(k, v) => keyName(k) -> bareSql(v)
      }
      SnapshotUpdateCommand(viewNameOf(t).get, set,
        cond.map(bareSql).getOrElse("true"))
    case MergeIntoTable(t, source, cond, matched, notMatched, Seq(), _)
        if viewNameOf(t).isDefined &&
          mergeKeys(cond).isDefined &&
          mergeMode(matched, notMatched).isDefined =>
      SnapshotMergeCommand(viewNameOf(t).get, mergeKeys(cond).get,
        source, mergeMode(matched, notMatched).get)
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

/** `MERGE INTO <view> t USING <source> s ON t.k = s.k
  *   WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  * (→ [[SnapshotLog.upsertBatch]]) and
  * `… WHEN MATCHED THEN DELETE` (→ the CDC delete path). The source
  * plan is carried as a constructor field — NOT a child, so the
  * analyzer leaves it alone — and materialized at run time. */
case class SnapshotMergeCommand(
    view: String, keys: Seq[String], source: LogicalPlan, delete: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = SnapshotDml.output

  override def run(spark: SparkSession): Seq[Row] = {
    val (path, partCol, _, _) = Catalog.dmlTarget(view).getOrElse(
      sys.error(s"$view is not a registered snapshot-DML target"))
    val live = SnapshotLog.read(spark, path).getOrElse(
      sys.error(s"$view has no committed version"))
    val src = org.apache.spark.sql.GraftSqlShim.ofRows(spark, source)
    val have = src.columns.map(_.toLowerCase).toSet
    val changes =
      if (delete) {
        // WHEN MATCHED THEN DELETE: the delete batch must carry each
        // matched row's REAL column values — above all its partition
        // value, which routes the CDC delete to the right partition
        // (a keys-only source knows none of that). One semi-join
        // against the live snapshot materializes exactly the matched
        // rows; absent source keys drop out here, so they no-op.
        live.join(
          src.select(keys.map(col): _*).distinct(), keys, "left_semi")
          .withColumn("__op", lit("D"))
      } else {
        // UPDATE* + INSERT*: by-name column matching, table order
        src.select(live.schema.fields.toSeq.map { f =>
          if (have(f.name.toLowerCase)) col(f.name).cast(f.dataType).as(f.name)
          else sys.error(s"MERGE source lacks table column ${f.name}")
        }: _*)
      }
    val bp = new org.apache.hadoop.fs.Path(path)
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // batch ids are MONOTONE, derived from the table's own version
    // chain — a nanoTime id would make the manifest history (staging
    // dir names are built from the batch id) nondeterministic across
    // re-runs of an otherwise-deterministic statement sequence
    val batchId =
      SnapshotLog.readManifest(fs, bp).map(_.version + 1).getOrElse(1L)
    SnapshotLog.upsertBatch(spark, path, changes, keys,
      orderCol = keys.head, partCol = partCol,
      batchId = batchId, maxRetries = 5,
      statsCols = Nil, clusterBy = Nil, clusterFiles = 16,
      opCol = if (delete) Some("__op") else None, writeCdf = false)
    val version =
      SnapshotLog.readManifest(fs, bp).map(_.version).getOrElse(-1L)
    SnapshotDml.repin(spark, view)
    Seq(Row(if (delete) "MERGE_DELETE" else "MERGE", version, false, 0L, 0L))
  }
}
