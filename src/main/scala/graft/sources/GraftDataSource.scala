package graft.sources

import java.util

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graft").load(path)` — the path-addressed read
  * surface next to [[GraftCatalog]]'s name-addressed one (Delta's
  * `format("delta")` shape). Options: `versionAsOf = <n>` /
  * `timestampAsOf = '<ts>'` for time travel.
  *
  * Same DV-safety design as the catalog: this provider only RESOLVES
  * to a [[GraftSnapshotTable]]; the actual read is the
  * planner-integrated v1 substitution
  * ([[graft.plans.GraftCatalogRelationRule]], injected by
  * `graft.GraftExtensions`). Without the extension a read fails closed
  * rather than bypassing deletion vectors. */
final class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = false

  // Spark resolves a format() load by calling inferSchema THEN getTable
  // on the SAME provider instance with the same options — cache the
  // resolved table across the two so resolution costs one manifest
  // load (FS round-trip + parse), not two. Keyed by the relevant
  // options: a provider instance reused with different options (not a
  // path Spark takes today) still resolves correctly.
  private var cached: Option[((String, Option[String], Option[String]), GraftSnapshotTable)] = None

  private def load(options: CaseInsensitiveStringMap): GraftSnapshotTable = synchronized {
    val base = Option(options.get("path")).getOrElse(
      sys.error("format(\"graft\") needs a path: .load(<table dir>)"))
    val key = (base, Option(options.get("versionAsOf")),
      Option(options.get("timestampAsOf")))
    cached.collect { case (k, t) if k == key => t }.getOrElse {
      val spark = SparkSession.active
      val bp = new Path(base)
      val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val version: Option[Long] =
        Option(options.get("versionAsOf")).map(_.trim.toLong)
          .orElse(Option(options.get("timestampAsOf")).map { ts =>
            // parse with Spark's string→timestamp cast so the literal
            // is interpreted under spark.sql.session.timeZone (not the
            // JVM default) and date-only forms ('2024-01-01') work —
            // Delta's option semantics
            val ms = Option(spark.range(1)
                .select(org.apache.spark.sql.functions.lit(ts.trim)
                  .cast(org.apache.spark.sql.types.TimestampType))
                .head().getTimestamp(0))
              .getOrElse(sys.error(s"timestampAsOf: cannot parse '$ts' as a timestamp"))
              .getTime
            SnapshotLog.versionAsOfTime(spark, base, ms).getOrElse(
              sys.error(s"$base has no version committed at or before $ts"))
          })
      val m = version match {
        case Some(v) => SnapshotLog.readManifestAt(fs, bp, v)
        case None => SnapshotLog.readManifest(fs, bp)
      }
      val t = m.map(new GraftSnapshotTable(base, version, _,
          Identifier.of(Array("graft"), base)))
        .getOrElse(sys.error(s"$base has no committed graft manifest"))
      cached = Some(key -> t)
      t
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    load(options).schema()

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    load(new CaseInsensitiveStringMap(properties))
}
