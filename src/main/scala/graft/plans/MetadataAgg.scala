package graft.plans

import scala.annotation.tailrec

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}

import graft.sources.{SnapshotFileIndex, SnapshotLog}

/** Metadata-only aggregates over commit-log tables — the Iceberg
  * snapshot-summary / Delta `OptimizeMetadataOnlyDeltaQuery` idea as an
  * optimizer rule: a global `COUNT(*)` (and `MIN`/`MAX` of the exposed
  * partition column) over a graft relation folds to a [[LocalRelation]]
  * computed from the MANIFEST, so the job reads zero data files. At
  * 100 TB that is a kilobyte metadata lookup replacing a 10^5-file
  * scan; `SELECT COUNT(*) FROM t` and `df.count()` both hit it.
  *
  * Fires only when every piece is PROVEN from metadata:
  *  - the child is the bare graft [[LogicalRelation]] under
  *    cardinality-preserving `Project`s only — a deletion-vector
  *    anti-join, row-tracking join, or any `Filter` breaks the shape
  *    and the query keeps its normal plan (so DV-masked rows are never
  *    double-counted: a DV table simply never matches);
  *  - every live file carries a recorded row count
  *    ([[SnapshotLog.countRows]]'s totality contract — partial
  *    metadata degrades to a scan, never to a wrong number);
  *  - `MIN`/`MAX` additionally require the typed partition exposure
  *    ([[SnapshotFileIndex.partitionSchema]] non-empty: keys proven to
  *    round-trip string↔type bit-exactly) and per-partition counts, so
  *    keys of empty partitions (possible only via 0-row files — no
  *    writer produces them, but a hand-edited manifest could) are
  *    excluded from the extremes.
  *
  * Registered through [[graft.GraftExtensions]]; graded end-to-end by
  * q129 and MetadataAggSpec. */
object MetadataAggRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
      rewrite(agg, aggExprs, child).getOrElse(agg)
  }

  /** The graft file index under cardinality-preserving Projects only,
    * plus the alias substitution accumulated on the way down (output
    * attribute → scan attribute). */
  @tailrec
  private def stripProjects(
      p: LogicalPlan,
      subst: Map[Long, Attribute]): Option[(SnapshotFileIndex, Seq[Attribute],
      Map[Long, Attribute])] = p match {
    case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
        if fs.location.isInstanceOf[SnapshotFileIndex] =>
      Some((fs.location.asInstanceOf[SnapshotFileIndex], lr.output, subst))
    case Project(list, ch) =>
      // a Project never changes cardinality (COUNT is safe under ANY
      // projection); for MIN/MAX lineage only simple attribute slots
      // and aliases-of-attributes extend the substitution — anything
      // else simply has no traceable lineage and the per-column check
      // below refuses
      val step: Map[Long, Attribute] = list.collect {
        case a: Attribute => a.exprId.id -> a
        case al @ Alias(a: Attribute, _) => al.exprId.id -> a
      }.toMap
      stripProjects(ch, subst.map { case (k, v) =>
        k -> step.get(v.exprId.id).map(_.asInstanceOf[Attribute]).getOrElse(v)
      } ++ step.filterNot { case (k, _) => subst.contains(k) })
    case _ => None
  }

  /** Types whose `cast(x AS string)` round-trips bit-exactly — the
    * same proof class as [[graft.sources.SnapshotRelation]]'s typed
    * partition exposure (timestamps are timezone-dependent,
    * float/double format-ambiguous: excluded). */
  private def roundTripType(dt: org.apache.spark.sql.types.DataType)
      : Boolean = dt match {
    case org.apache.spark.sql.types.StringType |
        org.apache.spark.sql.types.ByteType |
        org.apache.spark.sql.types.ShortType |
        org.apache.spark.sql.types.IntegerType |
        org.apache.spark.sql.types.LongType |
        org.apache.spark.sql.types.BooleanType |
        org.apache.spark.sql.types.DateType => true
    case _: org.apache.spark.sql.types.DecimalType => true
    case _ => false
  }

  private def parseExact(
      s: String,
      dt: org.apache.spark.sql.types.DataType): Option[Any] = {
    val v = org.apache.spark.sql.catalyst.expressions.Cast(
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType),
      dt, Some("UTC"),
      org.apache.spark.sql.catalyst.expressions.EvalMode.TRY).eval(null)
    if (v == null) return None
    val back = org.apache.spark.sql.catalyst.expressions.Cast(
      Literal(v, dt), org.apache.spark.sql.types.StringType, Some("UTC"),
      org.apache.spark.sql.catalyst.expressions.EvalMode.TRY).eval(null)
    if (back == null || back.toString != s) None else Some(v)
  }

  private def rewrite(
      agg: Aggregate,
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    // cheap structural pre-check before touching any metadata
    val shapes = aggExprs.map {
      case al @ Alias(AggregateExpression(f, Complete, false, None, _), _) =>
        f match {
          case Count(Seq(Literal(v, _))) if v != null => Some((al, "count", None))
          case Count(Seq(a: Attribute)) => Some((al, "countcol", Some(a)))
          case Min(a: Attribute) => Some((al, "min", Some(a)))
          case Max(a: Attribute) => Some((al, "max", Some(a)))
          case _ => None
        }
      case _ => None
    }
    if (shapes.exists(_.isEmpty)) return None
    val wanted = shapes.flatten
    stripProjects(child, Map.empty).flatMap { case (idx, relOut, subst) =>
      val m = idx.manifest
      lazy val cnt = SnapshotLog.countRows(m)
      // the scan attribute of each exposed partition column → its
      // manifest-key COMPONENT index (multi-column layouts expose all)
      val partIdxOf: Map[Long, Int] =
        idx.partitionSchema.fields.toSeq.zipWithIndex.flatMap {
          case (f, i) => relOut.find(_.name == f.name).map(_.exprId.id -> i)
        }.toMap
      def resolve(a: Attribute): Attribute = subst.getOrElse(a.exprId.id, a)
      def partIndexOf(a: Attribute): Option[Int] =
        partIdxOf.get(resolve(a).exprId.id)
      // typed component values of every NON-EMPTY live partition key
      lazy val liveKeyValues: Option[Seq[Seq[Any]]] = for {
        (_, valueOf) <- idx.typedParts
        perPart <- SnapshotLog.partitionCounts(m)
        live = perPart.filter(_._2 > 0L).keys.toSeq if live.nonEmpty
      } yield live.map(valueOf)
      def partExtreme(i: Int, kind: String): Option[Any] =
        liveKeyValues.map { ks =>
          val dt = idx.partitionSchema.fields(i).dataType
          val ord = TypeUtils.getInterpretedOrdering(dt)
          val vs = ks.map(_(i))
          if (kind == "min") vs.min(ord) else vs.max(ord)
        }
      // COUNT(col): the sum of per-file non-null counts, total or
      // nothing (and never on a DV table) — countNonNull's contract.
      // The attribute must be a genuine relation output for the same
      // shadowed-alias reason statsExtreme requires it.
      def nonNullCount(a: Attribute): Option[Any] = {
        val attr = resolve(a)
        if (!relOut.exists(_.exprId == attr.exprId)) return None
        // an exposed partition column is non-null by construction
        // (NULL routes to a key typed exposure refuses) — COUNT(p)
        // equals COUNT(*) whenever the typed exposure is active
        if (partIndexOf(a).isDefined && idx.typedParts.isDefined) cnt
        else SnapshotLog.countNonNull(m, attr.name)
      }
      // MIN/MAX of a DATA column from the per-file stats bounds: the
      // recorded bounds are the file's exact `cast(min/max(c) AS
      // string)` (full values, never truncated), so when the column's
      // type round-trips string↔type bit-exactly and EVERY live file
      // carries bounds (an all-NULL-in-file column records none —
      // refuse, don't guess), the table extreme is the extreme of the
      // parsed bounds. DV tables never reach here (the anti-join
      // breaks the structural match; a DV could hide the extreme row).
      def statsExtreme(a: Attribute, kind: String): Option[Any] = {
        val attr = resolve(a)
        // the resolved attribute must be a GENUINE relation output — a
        // computed alias shadowing a stats column's NAME (e.g.
        // `withColumn("id", $"id" * 2)`) has no entry in `subst`, so
        // `resolve` returns the alias attribute itself; matching stats
        // by name would then fold the RAW column's bounds as if they
        // were the computed value's. Refuse: keep the scanning plan.
        if (!relOut.exists(_.exprId == attr.exprId)) return None
        if (m.dvs.nonEmpty || m.allFiles.isEmpty) return None
        if (!roundTripType(attr.dataType)) return None
        val bounds = m.allFiles.map(f =>
          m.stats.get(f).flatMap(_.get(attr.name)))
        if (bounds.exists(_.isEmpty)) return None
        val sides = bounds.flatten.map(b => if (kind == "min") b._1 else b._2)
        val typed = sides.map(s => parseExact(s, attr.dataType))
        if (typed.exists(_.isEmpty)) return None
        val ord = TypeUtils.getInterpretedOrdering(attr.dataType)
        Some(if (kind == "min") typed.flatten.min(ord)
        else typed.flatten.max(ord))
      }
      val values = wanted.map {
        case (_, "count", _) => cnt
        case (_, "countcol", Some(a)) => nonNullCount(a)
        case (_, kind, Some(a)) if partIndexOf(a).isDefined =>
          partExtreme(partIndexOf(a).get, kind)
        case (_, kind, Some(a)) => statsExtreme(a, kind)
        case _ => None
      }
      if (values.exists(_.isEmpty)) None
      else Some(LocalRelation(
        aggExprs.map(_.toAttribute),
        Seq(InternalRow(values.map(_.get): _*))))
    }
  }
}
