package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, AttributeReference, Coalesce, EqualTo, Expression, Literal,
  Not, OuterReference, SubqueryExpression}
import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
import org.apache.spark.sql.catalyst.plans.logical.{
  Assignment, CreateTable, CreateTableAsSelect, DeleteAction,
  DeleteFromTable, Filter, InsertAction, InsertIntoStatement,
  InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable,
  ReplaceTableAsSelect, SubqueryAlias, UpdateAction, UpdateStarAction,
  UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{coalesce, col, expr, lit, struct, when}
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
      case u: UnresolvedRelation => catalogDmlTarget(u.multipartIdentifier)
      case SubqueryAlias(ident, child) => deepest(child).orElse(Some(ident.name))
      case _ => None
    }
    deepest(table).filter(Catalog.dmlTarget(_).isDefined)
  }

  /** DML on a THREE-PART name through a configured [[graft.sources.GraftCatalog]]
    * — `DELETE FROM graft.ns.t WHERE …` / UPDATE / MERGE — resolved by
    * [[Catalog.dmlTarget]]'s dotted-name fallback to the same machinery
    * the registered views use (table directory + partition column from
    * the catalog and manifest). This rule fires at HINT resolution,
    * before Spark's own relation resolution would turn the name into a
    * v2 relation that only supports v2 row-level plans; the deepest-
    * match filter below then accepts the dotted name iff the fallback
    * resolves it. */
  private def catalogDmlTarget(parts: Seq[String]): Option[String] =
    if (parts.size < 3) None else Some(parts.mkString("."))

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

  /** The alias/relation names a side of the statement answers to —
    * what a qualified column reference (`t.price`, `src.flag`) names.
    * Lower-cased (Spark identifier resolution is case-insensitive by
    * default). */
  private def sideNames(p: LogicalPlan): Set[String] = {
    def walk(q: LogicalPlan): Seq[String] = q match {
      case u: UnresolvedRelation => Seq(u.multipartIdentifier.last)
      case SubqueryAlias(ident, child) => ident.name +: walk(child)
      case _ => Nil
    }
    walk(p).map(_.toLowerCase).toSet
  }

  /** SQL text of `e` with every column reference rewritten onto the
    * merge executor's joined frame: target-side refs become `__t_<c>`,
    * source-side `__s_<c>`. Qualified names pick their side by alias;
    * unqualified names take `default` — target inside MATCHED / NOT
    * MATCHED BY SOURCE clauses, source inside NOT MATCHED (insert)
    * clauses, matching what each clause can see of its row. */
  private def sidedSql(
      e: Expression, tq: Set[String], sq: Set[String], default: String): String = {
    def side(qual: Option[String]): String = qual.map(_.toLowerCase) match {
      case Some(q) if tq(q) => "__t_"
      case Some(q) if sq(q) => "__s_"
      case _ => default
    }
    e.transform {
      case a: AttributeReference =>
        UnresolvedAttribute(Seq(side(a.qualifier.lastOption) + a.name))
      case u: UnresolvedAttribute =>
        val qual =
          if (u.nameParts.size >= 2) Some(u.nameParts(u.nameParts.size - 2))
          else None
        UnresolvedAttribute(Seq(side(qual) + u.nameParts.last))
    }.sql
  }

  /** [[sidedSql]]'s Expression-preserving sibling, for
    * SUBQUERY-BEARING clause conditions (whose `.sql` round-trip is
    * not re-parseable): outer references — top level and inside each
    * subquery plan, whether the rule fired before or after Spark's
    * own subquery resolution — rewrite onto the merge executor's
    * joined frame (`__t_*` / `__s_*`), while the subquery's own
    * unqualified names stay inner. The result rides opaquely in a
    * [[DmlCond]] until the executor splices it over the joined frame
    * (the `__t_`-prefixed outer names cannot collide with any
    * subquery relation's columns, so correlation is exact here —
    * tighter than the DELETE/UPDATE caveat). */
  private def sidedExpr(
      e: Expression, tq: Set[String], sq: Set[String],
      default: String): Expression = {
    def side(qual: Option[String]): String = qual.map(_.toLowerCase) match {
      case Some(q) if tq(q) => "__t_"
      case Some(q) if sq(q) => "__s_"
      case _ => default
    }
    def innerSide(qual: Option[String]): Option[String] =
      qual.map(_.toLowerCase) match {
        case Some(q) if tq(q) => Some("__t_")
        case Some(q) if sq(q) => Some("__s_")
        case _ => None // unqualified inside a subquery = inner name
      }
    e.transformUp {
      case s: SubqueryExpression =>
        s.withNewPlan(s.plan.transformAllExpressions {
          case o: OuterReference =>
            val qual = o.e match {
              case a: AttributeReference => a.qualifier.lastOption
              case _ => None
            }
            UnresolvedAttribute(
              Seq(innerSide(qual).getOrElse(default) + o.name))
          case u: UnresolvedAttribute =>
            val qual =
              if (u.nameParts.size >= 2) Some(u.nameParts(u.nameParts.size - 2))
              else None
            innerSide(qual) match {
              case Some(p) => UnresolvedAttribute(Seq(p + u.nameParts.last))
              case None => u
            }
        })
      case a: AttributeReference =>
        UnresolvedAttribute(Seq(side(a.qualifier.lastOption) + a.name))
      case u: UnresolvedAttribute =>
        val qual =
          if (u.nameParts.size >= 2) Some(u.nameParts(u.nameParts.size - 2))
          else None
        UnresolvedAttribute(Seq(side(qual) + u.nameParts.last))
    }
  }

  /** Compile one parsed merge action into a [[MergeClause]]; None for
    * shapes the executor does not run (the statement then falls through
    * to Spark's own v2-only handling, which errors loudly rather than
    * silently doing the wrong thing). Subquery-bearing clause
    * CONDITIONS compile ([[sidedExpr]] + the executor's boolean-column
    * materialization); subqueries in assignment VALUES still refuse. */
  private def clauseOf(
      a: MergeAction, tq: Set[String], sq: Set[String],
      default: String): Option[MergeClause] = {
    def c(cond: Option[Expression]): (Option[String], Option[DmlCond]) =
      cond match {
        case Some(e) if hasSubquery(e) =>
          (None, Some(DmlCond(sidedExpr(e, tq, sq, default))))
        case other => (other.map(sidedSql(_, tq, sq, default)), None)
      }
    def asg(assignments: Seq[Assignment]): Seq[(String, String)] =
      assignments.map { case (Assignment(k, v)) =>
        keyName(k) -> sidedSql(v, tq, sq, default)
      }
    def mk(cond: Option[Expression], action: String,
        assignments: Seq[Assignment]): Option[MergeClause] = {
      if (assignments.exists(asn => hasSubquery(asn.value))) return None
      val (sql, sub) = c(cond)
      Some(MergeClause(sql, action, asg(assignments), sub))
    }
    a match {
      case UpdateStarAction(cond) => mk(cond, "update_star", Nil)
      case UpdateAction(cond, assigns, _) => mk(cond, "update", assigns)
      case DeleteAction(cond) => mk(cond, "delete", Nil)
      case InsertStarAction(cond) => mk(cond, "insert_star", Nil)
      case InsertAction(cond, assigns) => mk(cond, "insert", assigns)
      case _ => None
    }
  }

  /** Rewrites a subquery-bearing DML condition for RUNTIME re-analysis
    * against the bare live-table frame: outer attribute references
    * reduce to bare names (the executor's frame has no statement
    * alias), and INSIDE each subquery plan, target-qualified
    * references and already-resolved `OuterReference`s reduce the same
    * way so correlation re-resolves against the new outer frame (the
    * rule may fire before OR after Spark's own subquery resolution —
    * both shapes normalize to the same tree). Subquery relations
    * re-resolve by name through the catalog at run time. Caveat: a
    * correlated reference whose bare name collides with a column of
    * the subquery's own relation resolves inner after the strip —
    * correlation with distinct names (the standard shape) is exact. */
  private def prepareSubqueryCond(e: Expression, tq: Set[String]): Expression = {
    def strip(u: UnresolvedAttribute): UnresolvedAttribute =
      if (u.nameParts.size >= 2 &&
          tq(u.nameParts(u.nameParts.size - 2).toLowerCase))
        UnresolvedAttribute(Seq(u.nameParts.last))
      else u
    e.transformUp {
      case s: SubqueryExpression =>
        s.withNewPlan(s.plan.transformAllExpressions {
          case o: OuterReference => UnresolvedAttribute(Seq(o.name))
          case u: UnresolvedAttribute => strip(u)
        })
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
      case u: UnresolvedAttribute => strip(u)
    }
  }

  private def hasSubquery(e: Expression): Boolean =
    e.exists(_.isInstanceOf[SubqueryExpression])

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case DeleteFromTable(t, cond) if viewNameOf(t).isDefined =>
      if (hasSubquery(cond))
        SnapshotDeleteCommand(viewNameOf(t).get, "<subquery condition>",
          Some(DmlCond(prepareSubqueryCond(cond,
            sideNames(t) + viewNameOf(t).get.toLowerCase))))
      else SnapshotDeleteCommand(viewNameOf(t).get, bareSql(cond))
    case UpdateTable(t, assignments, cond) if viewNameOf(t).isDefined &&
        !assignments.exists(a => hasSubquery(a.value)) =>
      val set = assignments.map {
        case Assignment(k, v) => keyName(k) -> bareSql(v)
      }
      if (cond.exists(hasSubquery))
        SnapshotUpdateCommand(viewNameOf(t).get, set, "<subquery condition>",
          Some(DmlCond(prepareSubqueryCond(cond.get,
            sideNames(t) + viewNameOf(t).get.toLowerCase))))
      else
        SnapshotUpdateCommand(viewNameOf(t).get, set,
          cond.map(bareSql).getOrElse("true"))
    case MergeIntoTable(t, source, cond, matched, notMatched, nmbs, _)
        if viewNameOf(t).isDefined && mergeKeys(cond).isDefined => {
      val view = viewNameOf(t).get
      val tq = sideNames(t) + view.toLowerCase
      val sq = sideNames(source)
      val mc = matched.map(clauseOf(_, tq, sq, "__t_"))
      val nc = notMatched.map(clauseOf(_, tq, sq, "__s_"))
      val bc = nmbs.map(clauseOf(_, tq, sq, "__t_"))
      val ok = (mc ++ nc ++ bc).forall(_.isDefined) &&
        nc.flatten.forall(c => c.action != "update" && c.action != "delete") &&
        bc.flatten.forall(c => c.action == "update" || c.action == "delete")
      if (ok)
        SnapshotMergeCommand(view, mergeKeys(cond).get, source,
          mc.flatten, nc.flatten, bc.flatten)
      else plan
    }
    // SQL INSERT INTO / INSERT OVERWRITE on a registered commit-log
    // view: Spark would otherwise throw inserting-into-a-view. Static
    // PARTITION specs fall through (the partition value rides in the
    // rows themselves for this format).
    case i: InsertIntoStatement
        if viewNameOf(i.table).isDefined && i.partitionSpec.isEmpty =>
      SnapshotInsertCommand(viewNameOf(i.table).get, i.query,
        i.userSpecifiedCols, i.overwrite, i.byName)
    // CTAS in the engine's own format: CREATE TABLE db.t USING
    // graft_snapshot PARTITIONED BY (p) [LOCATION '…'] AS SELECT … —
    // the S9 gold-table CTAS model (ref sql/ddl_gold.sql:22-23)
    // expressed against the commit log instead of a directory dump.
    case c: CreateTableAsSelect if providerOf(c).contains("graft_snapshot") =>
      (c.name, identityPartCol(c)) match {
        case (UnresolvedIdentifier(nameParts, _), Some(pc)) =>
          SnapshotCtasCommand(nameParts, pc,
            locationOf(c), c.query, c.ignoreIfExists,
            c.tableSpec.properties)
        case _ => plan // no/compound partitioning: unsupported, loud error
      }
    // empty CREATE TABLE in the engine's format: commits version 1
    // with the declared schema and NO files — the DDL-first workflow
    // (define, then load) the CTAS path cannot express
    case c: CreateTable
        if c.tableSpec.provider.exists(_.equalsIgnoreCase("graft_snapshot")) =>
      (c.name, partColOrUnpartitioned(c.partitioning)) match {
        case (UnresolvedIdentifier(nameParts, _), Some(pc)) =>
          // Delta-style column DDL maps straight onto the property
          // machinery: `GENERATED ALWAYS AS (expr)` →
          // graft.generated.<col>, `GENERATED ALWAYS|BY DEFAULT AS
          // IDENTITY (START WITH s INCREMENT BY k)` →
          // graft.identity.<col> = s:k[:bydefault] — committed WITH
          // version 1, so the declare-while-empty guard is moot
          val colProps: Map[String, String] = c.columns.flatMap { cd =>
            cd.generationExpression.map(e =>
              graft.sources.SnapshotLog.GenColPrefix + cd.name -> e).toSeq ++
              cd.identityColumnSpec.map { sp =>
                graft.sources.SnapshotLog.IdentityPrefix + cd.name ->
                  (s"${sp.getStart}:${sp.getStep}" +
                    (if (sp.isAllowExplicitInsert) ":bydefault" else ""))
              }.toSeq
          }.toMap
          // a TBLPROPERTIES clause commits WITH version 1 — so
          // bucket/identity/CDF declarations land atomically at
          // CREATE (and SHOW CREATE TABLE's output replays verbatim)
          SnapshotCreateEmptyCommand(nameParts, c.tableSchema, pc,
            c.tableSpec.location, c.ignoreIfExists,
            c.tableSpec.properties ++ colProps)
        case _ => plan
      }
    // CREATE OR REPLACE TABLE … AS SELECT: full-refresh DDL — the
    // query result replaces contents AND schema as a NEW version in
    // the existing history (time travel to the pre-replace table
    // survives); on a missing table it creates
    case r: ReplaceTableAsSelect
        if r.tableSpec.provider.exists(_.equalsIgnoreCase("graft_snapshot")) =>
      (r.name, partColOrUnpartitioned(r.partitioning)) match {
        case (UnresolvedIdentifier(nameParts, _), Some(pc)) =>
          SnapshotReplaceCtasCommand(nameParts, pc, r.tableSpec.location,
            r.query, r.orCreate, r.tableSpec.properties)
        case _ => plan
      }
    // time travel: `FROM <view> VERSION AS OF n` / `TIMESTAMP AS OF ts`
    // anywhere in a query — the node is nested inside the SELECT, so
    // this is a tree transform, not a statement-level match. The pinned
    // snapshot replaces the node as an ALREADY-ANALYZED subplan built
    // from the historical manifest (same planner-integrated relation as
    // the live read), which the analyzer then leaves alone.
    case p =>
      p.transformUp {
        case RelationTimeTravel(rel, ts, ver) if viewNameOf(rel).isDefined =>
          val view = viewNameOf(rel).get
          val (path, partCol, _, _) = Catalog.dmlTarget(view).get
          val v: Long = (ver, ts) match {
            case (Some(s), _) =>
              try s.toLong catch {
                case _: NumberFormatException =>
                  sys.error(s"VERSION AS OF needs an integer version, got '$s'")
              }
            case (None, Some(e)) =>
              val millis = tsMillis(e).getOrElse(sys.error(
                s"TIMESTAMP AS OF needs a literal timestamp, got ${e.sql}"))
              SnapshotLog.versionAsOfTime(spark, path, millis).getOrElse(
                sys.error(s"$view has no version committed at or before ${e.sql}"))
            case _ => sys.error("time travel needs VERSION or TIMESTAMP AS OF")
          }
          SnapshotLog.readVersion(spark, path, v, Some(partCol)).getOrElse(
            sys.error(s"$view has no committed version $v"))
            .queryExecution.analyzed
      }
  }

  /** Epoch millis of a foldable `TIMESTAMP AS OF` operand: a timestamp
    * literal, or a string literal in `yyyy-MM-dd[ HH:mm:ss[.S]]`
    * (interpreted in UTC — the engine's session timezone contract). */
  private def tsMillis(e: Expression): Option[Long] = e match {
    case Literal(v: Long, _: org.apache.spark.sql.types.TimestampType) =>
      Some(v / 1000L) // internal micros
    case Literal(s, _: StringType) if s != null =>
      val str = s.toString.trim
      try {
        val local =
          if (str.length <= 10) java.time.LocalDate.parse(str).atStartOfDay()
          else java.time.LocalDateTime.parse(str.replace(' ', 'T'))
        Some(local.toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
      } catch { case _: java.time.format.DateTimeParseException => None }
    case _ => None
  }

  private def providerOf(c: CreateTableAsSelect): Option[String] =
    c.tableSpec.provider.map(_.toLowerCase)

  /** The identity-transform partition column(s) of a CREATE/CTAS
    * partitioning clause — comma-joined in declaration order for
    * `PARTITIONED BY (y, m)` — via the PUBLIC connector Transform API
    * (the case classes are private[sql]). None for any non-identity
    * transform. */
  private def partColOf(
      partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform])
      : Option[String] = {
    val cols = partitioning.map {
      case t if t.name == "identity" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1 =>
        t.references.head.fieldNames.head
      case _ => return None
    }
    if (cols.map(_.toLowerCase).distinct.size != cols.size) None
    else Some(cols.mkString(","))
  }

  private def identityPartCol(c: CreateTableAsSelect): Option[String] =
    partColOrUnpartitioned(c.partitioning)

  /** Some(cols) for identity transform(s), Some("" = NoPartCol) for NO
    * partitioning clause (an unpartitioned table, Delta's default
    * shape), None for anything else — which falls through to Spark's
    * own loud unsupported-partitioning error. */
  private def partColOrUnpartitioned(
      partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform])
      : Option[String] =
    if (partitioning.isEmpty) Some(SnapshotLog.NoPartCol)
    else partColOf(partitioning)

  private def locationOf(c: CreateTableAsSelect): Option[String] =
    c.tableSpec.location
}

/** One compiled MERGE clause: an optional condition plus an action,
  * every expression already rewritten onto the executor's joined frame
  * (`__t_*` / `__s_*` columns) as re-parseable SQL text.
  * `action` ∈ update_star | update | delete | insert_star | insert;
  * `assigns` is (target column → value SQL) for the assignment forms. */
case class MergeClause(
    cond: Option[String], action: String, assigns: Seq[(String, String)],
    subCond: Option[DmlCond] = None)

/** A subquery-bearing DML condition, deliberately wrapped in a class
  * the planner does NOT treat as an expression: `QueryPlan.expressions`
  * collects every `Expression`-typed constructor field (including
  * through `Option`/`Seq`), and an unresolved condition surfaced that
  * way would fail `CheckAnalysis` before the command ever ran. The
  * wrapper keeps the tree opaque until [[SnapshotDml.planPredicate]]
  * re-analyzes it against the live frame at execution time. */
final case class DmlCond(e: Expression)

private object SnapshotDml {
  /** Compiles a subquery-bearing condition into the write paths'
    * [[SnapshotLog.PlanPredicate]]: each selector splices the
    * condition as a logical `Filter` over the given frame's analyzed
    * plan and hands it back to the full analyzer/optimizer — names
    * resolve against the frame, subquery relations resolve through
    * the catalog, and `RewritePredicateSubquery` turns the predicate
    * into the correct (null-aware where needed) semi/anti join. The
    * `keeps` side filters on `NOT(COALESCE(cond, FALSE))` — FALSE and
    * NULL rows stay, exactly SQL DML's complement.
    *
    * Why NOT this way round and not `COALESCE(NOT cond, TRUE)`:
    * RewritePredicateSubquery matches `Not(InSubquery)` EVEN under the
    * coalesce and plans the null-aware anti form (`(x = k) OR
    * isnull(x = k)`), under which a row whose IN evaluates to NULL —
    * a NULL probe column, or a NULL in the value list — gets
    * `exists = TRUE` and is dropped from the complement. Matches
    * excludes it too (NULL ≠ TRUE), so the row would vanish from BOTH
    * selectors: silent row LOSS in any rewrite built on the pair.
    * With the coalesce INSIDE the negation the pattern cannot match,
    * the IN plans as a plain ExistenceJoin, and the pair is a proven
    * exact partition for NULL probes and NULL list values alike. */
  def planPredicate(
      spark: SparkSession,
      cond: Expression): graft.sources.SnapshotLog.PlanPredicate = {
    def withCond(df: DataFrame, c: Expression): DataFrame =
      org.apache.spark.sql.GraftSqlShim.ofRows(spark,
        Filter(c, df.queryExecution.analyzed))
    graft.sources.SnapshotLog.PlanPredicate(
      df => withCond(df, cond),
      df => withCond(df, Not(Coalesce(Seq(cond, Literal(false))))))
  }

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

case class SnapshotDeleteCommand(
    view: String, condSql: String, subCond: Option[DmlCond] = None)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = SnapshotDml.output
  override def run(spark: SparkSession): Seq[Row] = {
    val (path, partCol, _, _) = Catalog.dmlTarget(view).getOrElse(
      sys.error(s"$view is not a registered snapshot-DML target"))
    val matcher = subCond.map(c => SnapshotDml.planPredicate(spark, c.e))
    val out = SnapshotLog.deleteWhere(spark, path,
      if (matcher.isDefined) lit(true) else expr(condSql), partCol,
      deletionVectors = true, matcher = matcher).getOrElse(
      sys.error(s"$view has no committed version"))
    SnapshotDml.repin(spark, view)
    Seq(Row("DELETE", out.version, out.metadataOnly,
      out.droppedPartitions.size.toLong, out.rewrittenPartitions.size.toLong))
  }
}

case class SnapshotUpdateCommand(
    view: String, set: Seq[(String, String)], condSql: String,
    subCond: Option[DmlCond] = None)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = SnapshotDml.output
  override def run(spark: SparkSession): Seq[Row] = {
    val (path, partCol, _, _) = Catalog.dmlTarget(view).getOrElse(
      sys.error(s"$view is not a registered snapshot-DML target"))
    val matcher = subCond.map(c => SnapshotDml.planPredicate(spark, c.e))
    val out = SnapshotLog.updateWhere(spark, path,
      if (matcher.isDefined) lit(true) else expr(condSql),
      set.map { case (k, v) => k -> expr(v) }.toMap, partCol,
      matcher = matcher).getOrElse(
      sys.error(s"$view has no committed version"))
    SnapshotDml.repin(spark, view)
    Seq(Row("UPDATE", out.version, out.metadataOnly,
      out.droppedPartitions.size.toLong, out.rewrittenPartitions.size.toLong))
  }
}

/** The full conditional MERGE executor:
  * {{{
  *   MERGE INTO <view> t USING <source> s ON t.k = s.k [AND …]
  *   WHEN MATCHED [AND c] THEN UPDATE SET * | UPDATE SET a=…, … | DELETE
  *   WHEN NOT MATCHED [AND c] THEN INSERT * | INSERT (…) VALUES (…)
  *   WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET … | DELETE
  * }}}
  * The source plan is carried as a constructor field — NOT a child, so
  * the analyzer leaves it alone — and materialized at run time.
  *
  * Execution is the Delta two-phase shape collapsed into one pass over
  * a single outer join of target × source on the merge keys (inner
  * when only MATCHED clauses exist, target-right-outer without
  * NOT-MATCHED-BY-SOURCE, full outer with it): per row category the
  * FIRST clause whose condition holds fires (SQL MERGE clause-order
  * semantics), producing a CDC change row — op `U` carrying the new
  * column values, op `D` carrying the old row (whose partition value
  * routes the delete). Rows no clause claims simply drop out of the
  * change batch and stay as they are. [[SnapshotLog.upsertBatch]] then
  * rewrites only the touched partitions.
  *
  * Guards, both fail-fast: a source with DUPLICATE merge keys errors
  * (a nondeterministic multi-match is Delta's error too, not a silent
  * arbitrary pick), and a matched row whose partition value CHANGES is
  * routed as a genuine move — its old partition joins the rewrite set
  * (`extraAffected`) so the old row disappears in the same commit. */
case class SnapshotMergeCommand(
    view: String, keys: Seq[String], source: LogicalPlan,
    matched: Seq[MergeClause], notMatched: Seq[MergeClause],
    notMatchedBySource: Seq[MergeClause])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = SnapshotDml.output

  override def run(spark: SparkSession): Seq[Row] = {
    val (path, partCol, _, _) = Catalog.dmlTarget(view).getOrElse(
      sys.error(s"$view is not a registered snapshot-DML target"))
    val live = SnapshotLog.read(spark, path).getOrElse(
      sys.error(s"$view has no committed version"))
    val src = org.apache.spark.sql.GraftSqlShim.ofRows(spark, source).persist()
    val liveFields = live.schema.fields.toSeq
    // schema auto-merge (graft.autoMergeSchema + a star action): extra
    // source columns become new nullable table columns — the executor
    // computes over the WIDENED field list, existing rows read NULL,
    // and upsertBatch's evolution records the widened schema
    val m0 = {
      val bp0 = new org.apache.hadoop.fs.Path(path)
      SnapshotLog.readManifest(
        bp0.getFileSystem(spark.sparkContext.hadoopConfiguration), bp0)
    }
    val autoMerge = m0.exists(_.autoMerge)
    // GENERATED columns recompute through MERGE unless a clause assigns
    // them explicitly (Delta's SET * semantics): a star action carrying
    // a stale generated value must not be rejected by upsertBatch's
    // validation, and an explicit UPDATE of a dependency must refresh
    // the generated value. clauseRow NULLs the slot so applyGenerated
    // recomputes it from the post-image.
    val genCols = m0.map(SnapshotLog.generatedCols).getOrElse(Nil)
      .map(_._1.toLowerCase).toSet
    // identity columns allocate inside the write path — a star action
    // whose source lacks them is complete (update keeps the target's
    // id; insert's NULL slot allocates)
    val identCols = m0.map(_.identityCols).getOrElse(Nil)
      .map(_._1.toLowerCase).toSet
    val tFields =
      if (!autoMerge ||
          !(matched ++ notMatched).exists(_.action.endsWith("_star"))) liveFields
      else {
        val have = liveFields.map(_.name.toLowerCase).toSet
        liveFields ++ src.schema.fields.toSeq
          .filterNot(f => have(f.name.toLowerCase))
          .map(_.copy(nullable = true))
      }
    val liveHas = liveFields.map(_.name.toLowerCase).toSet
    try {
      val srcHave = src.columns.map(_.toLowerCase).toSet
      // star completeness: without auto-merge every table column must
      // come from the source; WITH it, Delta's SET * semantics apply —
      // source-missing target columns keep their target value
      // (update) or insert NULL, handled per-field in clauseRow
      // generated columns are exempt from star completeness — they
      // compute from the post-image, the source need not carry them
      val starOk = autoMerge || tFields.forall(f =>
        srcHave(f.name.toLowerCase) || genCols(f.name.toLowerCase) ||
          identCols(f.name.toLowerCase))
      (matched ++ notMatched).filter(_.action.endsWith("_star")).foreach { _ =>
        if (!starOk) sys.error(
          s"MERGE SET */INSERT * needs every table column in the source; " +
            s"missing: ${tFields.map(_.name).filterNot(f => srcHave(f.toLowerCase) || genCols(f.toLowerCase)).mkString(", ")}")
      }
      notMatched.filter(_.action == "insert").foreach { cl =>
        val assigned = cl.assigns.map(_._1.toLowerCase).toSet
        val miss = keys.filterNot(k => assigned(k.toLowerCase))
        if (miss.nonEmpty) sys.error(
          s"MERGE INSERT must assign every merge key; missing: ${miss.mkString(", ")}")
      }
      // Delta's multiple-match rule: duplicate source keys would make
      // which row wins arbitrary — refuse rather than silently pick
      if (src.groupBy(keys.map(col): _*).count()
          .filter(col("count") > 1).limit(1).count() > 0)
        sys.error("MERGE source has duplicate merge-key rows; " +
          "dedupe the source (e.g. latest-wins window) first")

      val tPresent = coalesce(col("__graft_t_present"), lit(false))
      val sPresent = coalesce(col("__graft_s_present"), lit(false))
      val liveT = live.select(tFields.map(f =>
        (if (liveHas(f.name.toLowerCase)) col(f.name)
         else lit(null).cast(f.dataType)).as(s"__t_${f.name}")): _*)
        .withColumn("__graft_t_present", lit(true))
      val srcS = src.select(src.columns.toSeq.map(c =>
        col(c).as(s"__s_$c")): _*).withColumn("__graft_s_present", lit(true))
      val joinType =
        if (notMatchedBySource.nonEmpty) "full_outer"
        else if (notMatched.nonEmpty) "right_outer"
        else "inner"
      val joined0 = liveT.join(srcS,
        keys.map(k => col(s"__t_$k") === col(s"__s_$k")).reduce(_ && _),
        joinType)

      // SUBQUERY clause conditions: Spark only admits IN/EXISTS in a
      // Filter, never inside the when()-chain projection — so each
      // subquery-bearing condition materializes as a BOOLEAN COLUMN
      // first, via the same analyzed-plan Filter splice the
      // DELETE/UPDATE paths use (PlanPredicate): TRUE rows tagged
      // true, FALSE/NULL rows tagged false, unioned back (an exact
      // partition under SQL semantics — RewritePredicateSubquery plans
      // the correct semi/anti joins). Each such clause doubles the
      // joined plan (two filters over it), so N subquery clauses cost
      // 2^N join replays — fine for the 1–2 the syntax realistically
      // carries, and correctness-neutral regardless.
      def label(kind: String, cls: Seq[MergeClause]): Seq[(String, MergeClause)] =
        cls.map(kind -> _)
      // with >= 2 subquery clauses the split-union replays the join
      // 2^N times — persist the joined frame once so each replay is a
      // cache read, not a join re-execution (released in the finally)
      val subCount = (matched ++ notMatched ++ notMatchedBySource)
        .count(_.subCond.isDefined)
      val joinCached = subCount >= 2
      if (joinCached) joined0.persist()
      var frame = joined0
      val rewritten =
        (label("m", matched) ++ label("n", notMatched) ++
          label("b", notMatchedBySource)).zipWithIndex.map {
          case ((kind, cl), i) =>
            cl.subCond match {
              case None => (kind, cl)
              case Some(sc) =>
                val cn = s"__graft_cc_$i"
                val pp = SnapshotDml.planPredicate(spark, sc.e)
                frame = pp.matches(frame).withColumn(cn, lit(true))
                  .unionByName(pp.keeps(frame).withColumn(cn, lit(false)))
                (kind, cl.copy(cond = Some(s"`$cn`"), subCond = None))
            }
        }
      val joined = frame
      val matchedC = rewritten.collect { case ("m", cl) => cl }
      val notMatchedC = rewritten.collect { case ("n", cl) => cl }
      val notMatchedBySourceC = rewritten.collect { case ("b", cl) => cl }

      // one struct per clause: (op, <table columns>), all branches cast
      // to the table schema so the when-chain unifies
      def clauseRow(cl: MergeClause): Column = {
        val assigns = cl.assigns.map { case (k, v) => k.toLowerCase -> v }.toMap
        val vals = tFields.map { f =>
          val v: Column = cl.action match {
            // generated + not explicitly assigned: NULL the slot so
            // applyGenerated recomputes over the post-image (stale
            // source/target values neither land nor reject)
            case "update_star" | "insert_star" | "update"
                if genCols(f.name.toLowerCase) &&
                  !assigns.contains(f.name.toLowerCase) => lit(null)
            case "update_star" if !srcHave(f.name.toLowerCase) =>
              col(s"__t_${f.name}")
            case "insert_star" if !srcHave(f.name.toLowerCase) => lit(null)
            case "update_star" | "insert_star" => col(s"__s_${f.name}")
            case "delete" => col(s"__t_${f.name}")
            case "update" =>
              assigns.get(f.name.toLowerCase).map(expr).getOrElse(col(s"__t_${f.name}"))
            case "insert" =>
              assigns.get(f.name.toLowerCase).map(expr)
                .getOrElse(lit(null))
          }
          v.cast(f.dataType).as(f.name)
        }
        val op = if (cl.action == "delete") "D" else "U"
        struct(lit(op).as("__op") +: vals: _*)
      }
      // first-true-clause-wins chain; no clause → null → row unclaimed
      def chain(clauses: Seq[MergeClause]): Column =
        clauses.foldRight(lit(null): Column) { (cl, els) =>
          when(expr(cl.cond.getOrElse("true")), clauseRow(cl)).otherwise(els)
        }
      val categories = Seq(
        (tPresent && sPresent, matchedC),
        (!tPresent && sPresent, notMatchedC),
        (tPresent && !sPresent, notMatchedBySourceC)).filter(_._2.nonEmpty)
      val picked = categories.tail.foldLeft(
        when(categories.head._1, chain(categories.head._2))) {
        case (acc, (cond, cls)) => acc.when(cond, chain(cls))
      }

      // unpartitioned target (partCol = ""): every row lives in the one
      // hidden partition, so a "partition move" cannot exist — the
      // old-partition column is only materialized for partitioned
      // tables (multi-column layouts use the same composite key the
      // write path routes by)
      val oldPartExpr =
        if (partCol.isEmpty) lit(null).cast("string")
        else SnapshotLog.partitionKeyExpr(partCol, prefix = "__t_")
      val changes0 = joined
        .select(picked.as("__r"), oldPartExpr.as("__old_p"))
        .filter(col("__r").isNotNull)
        .select(tFields.map(f =>
          col("__r").getField(f.name).as(f.name)) :+
          col("__r").getField("__op").as("__op") :+ col("__old_p"): _*)
        .persist()
      try {
        // a matched UPDATE that changed the partition value must rewrite
        // the OLD partition too, or the old row would survive beside the
        // new one (the rewrite set is otherwise only the partitions the
        // change rows land in)
        val movedParts =
          if (partCol.isEmpty) Nil
          else changes0
            .filter(col("__old_p").isNotNull && col("__op") === "U" &&
              !(SnapshotLog.partitionKeyExpr(partCol) <=> col("__old_p")))
            .select(col("__old_p")).distinct().collect().map(_.getString(0)).toSeq
        val bp = new org.apache.hadoop.fs.Path(path)
        val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // batch ids are MONOTONE, derived from the table's own version
        // chain — a nanoTime id would make the manifest history (staging
        // dir names are built from the batch id) nondeterministic across
        // re-runs of an otherwise-deterministic statement sequence
        val batchId =
          SnapshotLog.readManifest(fs, bp).map(_.version + 1).getOrElse(1L)
        SnapshotLog.upsertBatch(spark, path, changes0.drop("__old_p"), keys,
          orderCol = keys.head, partCol = partCol,
          batchId = batchId, maxRetries = 5,
          statsCols = Nil, clusterBy = Nil, clusterFiles = 16,
          opCol = Some("__op"), writeCdf = false,
          extraAffected = movedParts)
        val version =
          SnapshotLog.readManifest(fs, bp).map(_.version).getOrElse(-1L)
        SnapshotDml.repin(spark, view)
        Seq(Row("MERGE", version, false, 0L, 0L))
      } finally {
        changes0.unpersist()
        if (joinCached) joined0.unpersist()
      }
    } finally src.unpersist()
  }
}

/** `INSERT INTO <view> [(cols)] SELECT …` / `INSERT OVERWRITE <view> …`
  * on a commit-log table (→ [[SnapshotLog.appendBatch]]). Alignment
  * follows SQL INSERT semantics: an explicit column list maps the
  * query's output positionally onto those columns (unnamed table
  * columns backfill NULL), `BY NAME` matches by name, and the bare
  * form is positional against the full table schema. Values cast to
  * the table's column types; the partition column must come out
  * non-null (the manifest keys on its canonical string). */
case class SnapshotInsertCommand(
    view: String, source: LogicalPlan, userCols: Seq[String],
    overwrite: Boolean, byName: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = SnapshotDml.output

  override def run(spark: SparkSession): Seq[Row] = {
    val (path, partCol, _, _) = Catalog.dmlTarget(view).getOrElse(
      sys.error(s"$view is not a registered snapshot-DML target"))
    val live = SnapshotLog.read(spark, path).getOrElse(
      sys.error(s"$view has no committed version"))
    val bp0 = new org.apache.hadoop.fs.Path(path)
    val m0 = SnapshotLog.readManifest(
      bp0.getFileSystem(spark.sparkContext.hadoopConfiguration), bp0)
    val src0 = org.apache.spark.sql.GraftSqlShim.ofRows(spark, source)
    // schema auto-merge (graft.autoMergeSchema): a BY NAME insert's
    // extra source columns become new nullable table columns instead
    // of being dropped — appendBatch's evolution records the widened
    // schema, existing rows read NULL
    val tFields =
      if (!byName || !m0.exists(_.autoMerge)) live.schema.fields.toSeq
      else {
        val have = live.schema.fieldNames.map(_.toLowerCase).toSet
        live.schema.fields.toSeq ++ src0.schema.fields.toSeq
          .filterNot(f => have(f.name.toLowerCase))
          .map(_.copy(nullable = true))
      }
    // positional alignment goes through index-named columns — a SELECT
    // output column named after its expression ("(o_totalprice * 0.25)")
    // would otherwise trip dotted-name parsing in col()
    val src = src0.toDF(src0.columns.indices.map(i => s"__c$i"): _*)
    def srcCol(i: Int) = col(s"__c$i")
    val aligned =
      if (userCols.nonEmpty) {
        require(userCols.size == src.columns.length,
          s"INSERT column list has ${userCols.size} columns but the query " +
            s"produces ${src.columns.length}")
        val bad = userCols.filterNot(c =>
          tFields.exists(_.name.equalsIgnoreCase(c)))
        if (bad.nonEmpty) sys.error(
          s"INSERT column list names unknown columns: ${bad.mkString(", ")}")
        src.select(tFields.map { f =>
          val i = userCols.indexWhere(_.equalsIgnoreCase(f.name))
          if (i >= 0) srcCol(i).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }: _*)
      } else if (byName) {
        val have = src0.columns.map(_.toLowerCase).zipWithIndex.toMap
        // generated/identity columns compute/allocate inside the
        // write path — BY NAME may omit them
        val computed = m0.toSeq.flatMap(mm =>
          SnapshotLog.generatedCols(mm).map(_._1) ++
            mm.identityCols.map(_._1)).map(_.toLowerCase).toSet
        src.select(tFields.map { f =>
          have.get(f.name.toLowerCase) match {
            case Some(i) => srcCol(i).cast(f.dataType).as(f.name)
            case None if computed(f.name.toLowerCase) =>
              lit(null).cast(f.dataType).as(f.name)
            case None => sys.error(s"INSERT BY NAME lacks table column ${f.name}")
          }
        }: _*)
      } else {
        require(src.columns.length == tFields.size,
          s"INSERT query produces ${src.columns.length} columns; " +
            s"table has ${tFields.size}")
        src.select(tFields.zipWithIndex.map { case (f, i) =>
          srcCol(i).cast(f.dataType).as(f.name)
        }: _*)
      }
    // NULL partition values (after any GENERATED compute) reject
    // inside appendBatch against the staged data — one execution of
    // the query, no driver-side pre-check count (which would run the
    // source twice and miss a non-deterministic source's NULLs)
    val bp = new org.apache.hadoop.fs.Path(path)
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchId =
      SnapshotLog.readManifest(fs, bp).map(_.version + 1).getOrElse(1L)
    val version = SnapshotLog.appendBatch(
      spark, path, aligned, partCol, batchId, overwrite = overwrite)
    SnapshotDml.repin(spark, view)
    Seq(Row(if (overwrite) "INSERT_OVERWRITE" else "INSERT",
      version, false, 0L, 0L))
  }
}

/** `CREATE TABLE db.t (cols) USING graft_snapshot PARTITIONED BY (p)
  * [LOCATION '…']` — an EMPTY table: version 1 holds the declared
  * schema and no files (the commit-log equivalent of DDL-first
  * workflows), registered for name-based SQL and the whole DML
  * surface in the same statement. The first INSERT/COPY/upsert lands
  * on top as version 2. */
case class SnapshotCreateEmptyCommand(
    nameParts: Seq[String], tblSchema: org.apache.spark.sql.types.StructType,
    partCol: String, location: Option[String], ignoreIfExists: Boolean,
    colProps: Map[String, String] = Map.empty)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = SnapshotDml.output

  override def run(spark: SparkSession): Seq[Row] = {
    val (db, name) = nameParts match {
      case Seq(n) => ("default", n)
      case parts => (parts.init.mkString("_"), parts.last)
    }
    val path = location.getOrElse(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/$db.$name")
    val bp = new org.apache.hadoop.fs.Path(path)
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing = SnapshotLog.readManifest(fs, bp)
    if (existing.isDefined) {
      if (ignoreIfExists) {
        Catalog.registerSnapshotLog(spark, db, name, path, Some(partCol))
        return Seq(Row("CREATE_EXISTS", existing.get.version, true, 0L, 0L))
      }
      sys.error(s"snapshot table already exists at $path " +
        "(use CREATE TABLE IF NOT EXISTS to no-op)")
    }
    SnapshotLog.partColsOf(partCol).foreach(pc => require(
      tblSchema.fieldNames.exists(_.equalsIgnoreCase(pc)),
      s"partition column $pc is not among the declared columns"))
    if (!SnapshotLog.tryCommit(fs, bp, SnapshotLog.Manifest(
        1L, Map.empty, schemaJson = Some(tblSchema.json), op = Some("CREATE"),
        props = colProps + (SnapshotLog.PartColProp -> partCol))))
      sys.error(s"snapshot table at $path already has a version claim")
    Catalog.registerSnapshotLog(spark, db, name, path, Some(partCol))
    Seq(Row("CREATE", 1L, true, 0L, 0L))
  }
}

/** `CREATE OR REPLACE TABLE db.t USING graft_snapshot PARTITIONED BY
  * (p) [LOCATION '…'] AS SELECT …` — full-refresh DDL: on an existing
  * table the query result replaces CONTENTS AND SCHEMA as a new
  * version in the same history (the pre-replace table still
  * time-travels; properties, constraints, txn watermarks, and column
  * mapping carry — constraints are re-enforced against the new rows,
  * failing loudly if the replacement violates them); on a missing
  * table it creates version 1, exactly the CTAS path. */
case class SnapshotReplaceCtasCommand(
    nameParts: Seq[String], partCol: String, location: Option[String],
    query: LogicalPlan, orCreate: Boolean,
    tblProps: Map[String, String] = Map.empty)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = SnapshotDml.output

  override def run(spark: SparkSession): Seq[Row] = {
    val (db, name) = nameParts match {
      case Seq(n) => ("default", n)
      case parts => (parts.init.mkString("_"), parts.last)
    }
    val path = location.getOrElse(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/$db.$name")
    val bp = new org.apache.hadoop.fs.Path(path)
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = SnapshotLog.readManifest(fs, bp).isDefined
    if (!exists && !orCreate)
      sys.error(s"REPLACE TABLE: no snapshot table at $path " +
        "(use CREATE OR REPLACE to create)")
    val df = org.apache.spark.sql.GraftSqlShim.ofRows(spark, query)
    // TBLPROPERTIES on the CREATE arm (table doesn't exist yet):
    // commit them as an empty v1 first, same declare-before-data
    // ordering as CTAS. On the REPLACE arm existing properties carry
    // forward unchanged (declare-while-empty guards would refuse a
    // retroactive bucket/identity change anyway) — use ALTER TABLE.
    if (!exists && tblProps.nonEmpty &&
        !SnapshotLog.tryCommit(fs, bp, SnapshotLog.Manifest(
          1L, Map.empty, schemaJson =
            Some(org.apache.spark.sql.types.StructType(
              df.schema.fields.map(_.copy(nullable = true))).json),
          op = Some("CREATE"), props = tblProps)))
      sys.error(s"snapshot table at $path already has a version claim")
    // a GENERATED partition column computes inside appendBatch — the
    // query need not carry it (same exemption as INSERT); NULL
    // partition values are rejected by appendBatch's staged-data gate
    // in the same single execution of the query (a pre-check count
    // here would run the source twice, and a non-deterministic source
    // could pass it yet still write NULLs)
    val declaredGen = SnapshotLog.readManifest(fs, bp)
      .map(_.props.keySet.filter(_.startsWith(SnapshotLog.GenColPrefix))
        .map(_.stripPrefix(SnapshotLog.GenColPrefix).toLowerCase))
      .getOrElse(Set.empty)
    SnapshotLog.partColsOf(partCol).foreach(pc => require(
      declaredGen(pc.toLowerCase) ||
        df.columns.exists(_.equalsIgnoreCase(pc)),
      s"partition column $pc is not in the query output"))
    val batchId =
      SnapshotLog.readManifest(fs, bp).map(_.version + 1).getOrElse(1L)
    val version = SnapshotLog.appendBatch(
      spark, path, df, partCol, batchId, overwrite = true,
      propsAdd = Map(SnapshotLog.PartColProp -> partCol))
    // a REPLACE may re-declare the layout; propsAdd is existing-wins
    // (right for seeds, wrong for a declaration) — reconcile the rare
    // layout change with one metadata commit
    val stamped = SnapshotLog.readManifest(fs, bp)
      .flatMap(_.props.get(SnapshotLog.PartColProp))
    if (!stamped.contains(partCol))
      SnapshotLog.setProperties(spark, path,
        Map(SnapshotLog.PartColProp -> partCol))
    Catalog.registerSnapshotLog(spark, db, name, path, Some(partCol))
    Seq(Row(if (exists) "REPLACE" else "CREATE_OR_REPLACE",
      version, false, 0L, 0L))
  }
}

/** `CREATE TABLE db.t USING graft_snapshot PARTITIONED BY (p)
  * [LOCATION '…'] AS SELECT …` — CTAS in the engine's own table
  * format: the query result becomes version 1 of a brand-new commit
  * log, registered for name-based SQL (and thereby for the whole DML
  * surface) in the same statement. Without LOCATION the table lands
  * under the session warehouse dir at `<db>.<name>`. */
case class SnapshotCtasCommand(
    nameParts: Seq[String], partCol: String, location: Option[String],
    query: LogicalPlan, ignoreIfExists: Boolean,
    tblProps: Map[String, String] = Map.empty)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = SnapshotDml.output

  override def run(spark: SparkSession): Seq[Row] = {
    val (db, name) = nameParts match {
      case Seq(n) => ("default", n)
      case parts => (parts.init.mkString("_"), parts.last)
    }
    val path = location.getOrElse(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/$db.$name")
    val bp = new org.apache.hadoop.fs.Path(path)
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing = SnapshotLog.readManifest(fs, bp)
    if (existing.isDefined) {
      if (ignoreIfExists) {
        Catalog.registerSnapshotLog(spark, db, name, path, Some(partCol))
        return Seq(Row("CTAS_EXISTS", existing.get.version, true, 0L, 0L))
      }
      sys.error(s"snapshot table already exists at $path " +
        "(use CREATE TABLE IF NOT EXISTS to no-op)")
    }
    val df = org.apache.spark.sql.GraftSqlShim.ofRows(spark, query)
    SnapshotLog.partColsOf(partCol).foreach(pc => require(
      df.columns.exists(_.equalsIgnoreCase(pc)),
      s"CTAS partition column $pc is not in the query output"))
    // a TBLPROPERTIES clause commits as an empty v1 FIRST, so
    // property-driven write behavior (bucketing, identity, CDF,
    // generated columns) applies to the CTAS data itself (landing
    // as v2) — same declare-before-data ordering the empty-CREATE +
    // INSERT flow gets naturally
    if (tblProps.nonEmpty &&
        !SnapshotLog.tryCommit(fs, bp, SnapshotLog.Manifest(
          1L, Map.empty, schemaJson =
            Some(org.apache.spark.sql.types.StructType(
              df.schema.fields.map(_.copy(nullable = true))).json),
          op = Some("CREATE"), props = tblProps)))
      sys.error(s"snapshot table at $path already has a version claim")
    // NULL partition values reject inside appendBatch against the
    // staged data — one execution of the query, no pre-check count
    val version = SnapshotLog.appendBatch(spark, path, df, partCol, batchId = 1L,
      propsAdd = Map(SnapshotLog.PartColProp -> partCol))
    Catalog.registerSnapshotLog(spark, db, name, path, Some(partCol))
    Seq(Row("CTAS", version, false, 0L, 0L))
  }
}
