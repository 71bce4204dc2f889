package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{
  UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, Cast, DateFormatClass, EqualTo, EvalMode, Expression,
  GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal,
  PredicateHelper, TruncTimestamp, Year}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, DateType, TimestampType}

import graft.sources.{SnapshotFileIndex, SnapshotLog}

/** Partition pruning THROUGH generated columns — Delta's
  * generated-column partition-filter derivation: a table partitioned by
  * `month GENERATED ALWAYS AS date_format(ts, 'yyyy-MM')` and queried
  * with `WHERE ts >= X AND ts < Y` would read every partition (the
  * filter never mentions `month`). This rule derives the implied
  * partition predicate — `month >= f(X) AND month <= f(Y)` — from the
  * declared generation expression and plants it next to the original
  * conjuncts, where the typed partition exposure
  * ([[SnapshotFileIndex.partitionSchema]]) turns it into real partition
  * pruning. The natural 100 TB layout (events partitioned by a date
  * derived from their timestamp) prunes on timestamp predicates with
  * no query rewrite.
  *
  * Soundness: only MONOTONE non-decreasing generation shapes derive
  * range bounds (`to_date`, `cast(x AS date)`, `year`, `date_trunc`,
  * `date_format` with a whitelisted ordered prefix pattern), always
  * with NON-STRICT derived bounds (`ts > X` still derives
  * `month >= f(X)` — f is flat within a month); equality and IN derive
  * for any shape (function application needs no monotonicity). The
  * original conjunct always stays — the derived filter can only REMOVE
  * partitions that provably contain no matching row. Evaluation uses
  * the session timezone, the same clock the write path's
  * `applyGenerated` used; the write path stamps that timezone
  * ([[SnapshotLog.GenTzProp]]) and derivation REFUSES when the reading
  * session's differs — a mismatch on date_format/to_date/date_trunc
  * shapes would silently prune partitions holding matching rows.
  *
  * The Filter may sit on the relation directly or above
  * cardinality-preserving `Project`s (pruned/aliased reads): attribute
  * lineage traces through simple projections, anything untraceable
  * refuses. Multi-column layouts derive independently per generated
  * partition column. */
case class DerivePartitionFilter(spark: SparkSession)
  extends Rule[LogicalPlan] with PredicateHelper {

  private val Derived = TreeNodeTag[Boolean]("graft.derivedPartitionFilter")

  /** date_format patterns whose output order matches time order. */
  private val MonotoneFormats =
    Set("yyyy", "yyyy-MM", "yyyy-MM-dd", "yyyy-MM-dd HH")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, child) if f.getTagValue(Derived).isEmpty =>
      strip(child, Map.empty) match {
        case Some((relOut, idx, subst)) =>
          val out = derive(cond, child.output, relOut, idx, subst)
            .map { extra => Filter(And(cond, extra), child) }.getOrElse(f)
          out.setTagValue(Derived, true)
          out
        case None => f
      }
  }

  /** The graft file index under cardinality-preserving Projects only,
    * plus the accumulated lineage (outer attribute id → scan
    * attribute) — only bare attributes and aliases-of-attributes
    * extend it; computed aliases have no traceable lineage and simply
    * never resolve to a scan column below. */
  @scala.annotation.tailrec
  private def strip(
      p: LogicalPlan,
      subst: Map[Long, Attribute]): Option[(Seq[Attribute],
      SnapshotFileIndex, Map[Long, Attribute])] = p match {
    case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
        if fs.location.isInstanceOf[SnapshotFileIndex] =>
      Some((lr.output, fs.location.asInstanceOf[SnapshotFileIndex], subst))
    case org.apache.spark.sql.catalyst.plans.logical.Project(list, ch) =>
      val step: Map[Long, Attribute] = list.collect {
        case a: Attribute => a.exprId.id -> a
        case al @ org.apache.spark.sql.catalyst.expressions
            .Alias(a: Attribute, _) => al.exprId.id -> a
      }.toMap
      strip(ch, subst.map { case (k, v) =>
        k -> step.getOrElse(v.exprId.id, v)
      } ++ step.filterNot { case (k, _) => subst.contains(k) })
    case _ => None
  }

  private def derive(
      cond: Expression,
      visible: Seq[Attribute],
      relOut: Seq[Attribute],
      idx: SnapshotFileIndex,
      subst: Map[Long, Attribute]): Option[Expression] = {
    val m = idx.manifest
    // the writer's stamped generation timezone must match ours — a
    // legacy table without the stamp keeps the documented caveat
    val sessionTz = spark.sessionState.conf.sessionLocalTimeZone
    if (m.props.get(SnapshotLog.GenTzProp).exists(_ != sessionTz)) return None
    val pFields = idx.partitionSchema.fields.toSeq // exposure active
    if (pFields.isEmpty) return None
    def traceToScan(a: Attribute): Attribute =
      subst.getOrElse(a.exprId.id, a)
    def outerFor(scan: Attribute): Option[Attribute] =
      visible.find(v => traceToScan(v).exprId == scan.exprId)
    val pcsLogical = SnapshotLog.partColsOf(
      m.props.getOrElse(SnapshotLog.PartColProp, ""))
    val conjuncts = pFields.flatMap { pField =>
      (for {
        pLogical <- pcsLogical.find(c => m.phys(c) == pField.name)
        genSql <- SnapshotLog.generatedCols(m).collectFirst {
          case (c, sql) if c.equalsIgnoreCase(pLogical) => sql }
        pScan <- relOut.find(_.name.equalsIgnoreCase(m.phys(pLogical)))
        pAttr <- outerFor(pScan)
        (baseLogical, mono, eval) <- parseGen(genSql, pField.dataType)
        baseScan <- relOut.find(_.name.equalsIgnoreCase(m.phys(baseLogical)))
        baseAttr <- outerFor(baseScan)
        if baseAttr.exprId != pAttr.exprId
      } yield deriveConjuncts(cond, baseAttr, pAttr, mono, eval))
        .getOrElse(Nil)
    }
    val fresh = conjuncts.filterNot(d =>
      splitConjunctivePredicates(cond).exists(_.semanticEquals(d)))
    if (fresh.isEmpty) None else Some(fresh.reduce(And))
  }

  /** Conjuncts implied on the partition attribute by bounds on the
    * base attribute. */
  private def deriveConjuncts(
      cond: Expression,
      base: Attribute,
      p: Attribute,
      monotone: Boolean,
      eval: (Any, DataType) => Option[Any]): Seq[Expression] = {
    def lo(v: Any, t: DataType): Option[Expression] =
      if (!monotone) None
      else eval(v, t).map(w => GreaterThanOrEqual(p, Literal(w, p.dataType)))
    def hi(v: Any, t: DataType): Option[Expression] =
      if (!monotone) None
      else eval(v, t).map(w => LessThanOrEqual(p, Literal(w, p.dataType)))
    def eq(v: Any, t: DataType): Option[Expression] =
      eval(v, t).map(w => EqualTo(p, Literal(w, p.dataType)))
    splitConjunctivePredicates(cond).flatMap {
      case GreaterThan(a: Attribute, Literal(v, t))
          if v != null && a.exprId == base.exprId => lo(v, t)
      case GreaterThanOrEqual(a: Attribute, Literal(v, t))
          if v != null && a.exprId == base.exprId => lo(v, t)
      case LessThan(Literal(v, t), a: Attribute)
          if v != null && a.exprId == base.exprId => lo(v, t)
      case LessThanOrEqual(Literal(v, t), a: Attribute)
          if v != null && a.exprId == base.exprId => lo(v, t)
      case LessThan(a: Attribute, Literal(v, t))
          if v != null && a.exprId == base.exprId => hi(v, t)
      case LessThanOrEqual(a: Attribute, Literal(v, t))
          if v != null && a.exprId == base.exprId => hi(v, t)
      case GreaterThan(Literal(v, t), a: Attribute)
          if v != null && a.exprId == base.exprId => hi(v, t)
      case GreaterThanOrEqual(Literal(v, t), a: Attribute)
          if v != null && a.exprId == base.exprId => hi(v, t)
      case EqualTo(a: Attribute, Literal(v, t))
          if v != null && a.exprId == base.exprId => eq(v, t)
      case EqualTo(Literal(v, t), a: Attribute)
          if v != null && a.exprId == base.exprId => eq(v, t)
      case In(a: Attribute, vs)
          if a.exprId == base.exprId &&
            vs.forall(e => e.isInstanceOf[Literal] &&
              e.asInstanceOf[Literal].value != null) =>
        val ws = vs.map { case Literal(v, t) => eval(v, t) }
        if (ws.exists(_.isEmpty)) None
        else Some(In(p, ws.flatten.distinct
          .map(w => Literal(w, p.dataType))))
      case _ => None
    }
  }

  /** Recognize a supported generation expression: returns the base
    * column's LOGICAL name, whether the shape is monotone
    * (range-derivable), and the literal evaluator
    * (base value, base type) → partition-typed value (None = refuse:
    * wrong result type, unparseable, null). */
  private def parseGen(genSql: String, pType: DataType)
      : Option[(String, Boolean, (Any, DataType) => Option[Any])] = {
    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    def evalOf(mk: Expression => Expression)
        : (Any, DataType) => Option[Any] = (v, t) =>
      try {
        val e = mk(Literal(v, t))
        if (e.dataType != pType) None else Option(e.eval(null))
      } catch { case scala.util.control.NonFatal(_) => None }
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(genSql)
      catch { case scala.util.control.NonFatal(_) => return None }
    def nameOf(e: Expression): Option[String] = e match {
      case UnresolvedAttribute(Seq(n)) => Some(n)
      case _ => None
    }
    parsed match {
      case UnresolvedFunction(Seq(fn), Seq(arg), false, _, _, _, _)
          if fn.equalsIgnoreCase("to_date") =>
        nameOf(arg).map((_, true,
          evalOf(l => Cast(l, DateType, tz, EvalMode.TRY))))
      case UnresolvedFunction(Seq(fn), Seq(arg), false, _, _, _, _)
          if fn.equalsIgnoreCase("year") =>
        nameOf(arg).map((_, true,
          evalOf(l => Year(Cast(l, DateType, tz, EvalMode.TRY)))))
      case UnresolvedFunction(Seq(fn), Seq(arg, Literal(fmt, _)), false,
          _, _, _, _)
          if fn.equalsIgnoreCase("date_format") &&
            fmt != null && MonotoneFormats.contains(fmt.toString) =>
        nameOf(arg).map((_, true, evalOf(l => DateFormatClass(
          Cast(l, TimestampType, tz, EvalMode.TRY),
          Literal(fmt.toString), tz))))
      case UnresolvedFunction(Seq(fn), Seq(Literal(unit, _), arg), false,
          _, _, _, _)
          if fn.equalsIgnoreCase("date_trunc") && unit != null =>
        nameOf(arg).map((_, true, evalOf(l => TruncTimestamp(
          Literal(unit.toString),
          Cast(l, TimestampType, tz, EvalMode.TRY), tz))))
      case c: Cast if c.dataType == DateType =>
        nameOf(c.child).map((_, true,
          evalOf(l => Cast(l, DateType, tz, EvalMode.TRY))))
      case _ => None
    }
  }
}
