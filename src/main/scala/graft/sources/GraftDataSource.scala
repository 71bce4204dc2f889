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
final class GraftDataSource extends TableProvider with DataSourceRegister
  with org.apache.spark.sql.sources.CreatableRelationProvider
  with org.apache.spark.sql.sources.StreamSourceProvider
  with org.apache.spark.sql.sources.StreamSinkProvider {

  override def shortName(): String = "graft"

  // true so the WRITE path hands us the incoming frame's schema and
  // partitionBy transforms (that is how a fresh-path
  // `df.write.format("graft").partitionBy(c).save(p)` learns its
  // layout); reads without a committed manifest still fail in
  // inferSchema below.
  override def supportsExternalMetadata(): Boolean = true

  // Spark resolves a format() load by calling inferSchema THEN getTable
  // on the SAME provider instance with the same options — cache the
  // resolved table across the two so resolution costs one manifest
  // load (FS round-trip + parse), not two. Keyed by the relevant
  // options, and SCOPED to one resolution: getTable consumes the entry
  // (see below), so a provider instance held across a write can never
  // serve a pre-write snapshot on a later load.
  private var cached: Option[((String, Option[String], Option[String]), GraftSnapshotTable)] = None

  /** BATCH change-feed read — Delta's option spelling:
    * `spark.read.format("graft").option("readChangeFeed","true")
    * [.option("startingVersion", a)][.option("endingVersion", b)]
    * .load(path)` (bounds inclusive). Resolves to a
    * [[GraftChangeFeedTable]]; the actual read is the substitution
    * rule's ranged feed plan, fail-closed like the snapshot read. */
  private def changeFeedOpt(
      options: CaseInsensitiveStringMap): Option[Table] = {
    if (!Option(options.get("readChangeFeed")).exists(_.trim.toBoolean))
      return None
    val base = Option(options.get("path")).getOrElse(
      sys.error("format(\"graft\") needs a path: .load(<table dir>)"))
    require(!options.containsKey("versionAsOf") &&
        !options.containsKey("timestampAsOf"),
      s"$base: readChangeFeed takes startingVersion/endingVersion, " +
        "not time-travel options")
    Some(new GraftChangeFeedTable(base,
      Option(options.get("startingVersion")).map(_.trim.toLong),
      Option(options.get("endingVersion")).map(_.trim.toLong)))
  }

  /** None iff the path has NO committed manifest (the fresh-path write
    * case); time-travel to a version that never existed still errors
    * loudly. Exactly one manifest load per resolution either way. */
  private def loadOpt(options: CaseInsensitiveStringMap): Option[GraftSnapshotTable] = synchronized {
    val base = Option(options.get("path")).getOrElse(
      sys.error("format(\"graft\") needs a path: .load(<table dir>)"))
    val key = (base, Option(options.get("versionAsOf")),
      Option(options.get("timestampAsOf")))
    cached.collect { case (k, t) if k == key => Some(t) }.getOrElse {
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
        case Some(v) =>
          Some(SnapshotLog.readManifestAt(fs, bp, v).getOrElse(
            sys.error(s"$base has no committed version $v")))
        case None => SnapshotLog.readManifest(fs, bp)
      }
      m.map { mm =>
        val t = new GraftSnapshotTable(base, version, mm,
          Identifier.of(Array("graft"), base))
        cached = Some(key -> t)
        t
      }
    }
  }

  private def load(options: CaseInsensitiveStringMap): GraftSnapshotTable =
    loadOpt(options).getOrElse(sys.error(
      s"${options.get("path")} has no committed graft manifest"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    changeFeedOpt(options).map(_.schema()).getOrElse(load(options).schema())

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    changeFeedOpt(options).foreach { cf =>
      synchronized { cached = None }
      return cf
    }
    // no committed manifest = a WRITE to a fresh path: resolve to the
    // pending (write-only) table carrying the frame's schema and
    // partitionBy transforms. Reads of fresh paths die earlier, in
    // inferSchema; time travel on a fresh path errors inside loadOpt.
    val t = loadOpt(options).getOrElse(
      new GraftPendingTable(options.get("path"), schema, partitioning))
    // resolution complete: drop the memoized manifest so a reused
    // provider instance re-reads the log next time (a long-lived
    // instance must never serve a stale snapshot after new commits)
    synchronized { cached = None }
    t
  }

  /** The v1 create path: `SaveMode.ErrorIfExists` (the default) and
    * `Ignore` never reach the v2 write plans — DataFrameWriter routes
    * them here (Delta implements the same interface for the same
    * reason). `partitionBy` columns arrive JSON-encoded under Spark's
    * `__partition_columns` option key. */
  override def createRelation(
      sqlContext: org.apache.spark.sql.SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.sources.BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val base = parameters.getOrElse("path",
      sys.error("format(\"graft\") needs a path: .save(<table dir>)"))
    val spark = data.sparkSession
    val bp = new Path(base)
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tableExists = SnapshotLog.readManifest(fs, bp).isDefined
    // Spark's DataSourceUtils.encodePartitioningColumns: a JSON string
    // array like ["day"] — parsed here structurally to avoid the
    // private[sql] helper
    val partHint = parameters.get("__partition_columns").flatMap { json =>
      try {
        val arr = org.json4s.jackson.JsonMethods.parse(json)
          .asInstanceOf[org.json4s.JArray].arr
          .map(_.asInstanceOf[org.json4s.JString].s)
        // partitionBy(y, m): comma-joined, declaration order (the
        // SnapshotLog.partColsOf multi-column spelling)
        if (arr.isEmpty) None else Some(arr.mkString(","))
      } catch {
        case e: Exception => sys.error(
          s"cannot parse partition columns '$json': ${e.getMessage}")
      }
    }.orElse(parameters.get(WriteIntoGraft.PartitionColOption))
    require(!parameters.contains("versionAsOf") &&
        !parameters.contains("timestampAsOf"),
      s"$base: cannot write to a time-traveled snapshot")
    val replaceWhere = parameters.get(WriteIntoGraft.ReplaceWhereOption)
    require(replaceWhere.isEmpty || mode == SaveMode.Overwrite,
      s"option(\"${WriteIntoGraft.ReplaceWhereOption}\", …) requires " +
        "mode overwrite — an append cannot replace")
    (mode, tableExists) match {
      case (SaveMode.ErrorIfExists, true) =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "TABLE_OR_VIEW_ALREADY_EXISTS",
          messageParameters = Map("relationName" -> s"graft.`$base`"))
      case (SaveMode.Ignore, true) => ()
      case _ =>
        WriteIntoGraft.run(base, data,
          overwriteAll = mode == SaveMode.Overwrite && tableExists &&
            replaceWhere.isEmpty,
          replaceWhere = replaceWhere.filter(_ => tableExists)
            .map(org.apache.spark.sql.functions.expr),
          partColHint = partHint,
          mergeSchema = parameters.get(WriteIntoGraft.MergeSchemaOption)
            .exists(_.trim.toBoolean),
          txn = WriteIntoGraft.txnOf(
            parameters.get(WriteIntoGraft.TxnAppIdOption),
            parameters.get(WriteIntoGraft.TxnVersionOption)),
          dynamicPartitionOverwrite = WriteIntoGraft.dynamicOverwrite(
            spark,
            parameters.get(WriteIntoGraft.PartitionOverwriteModeOption),
            hasReplaceWhere = replaceWhere.exists(_ => tableExists)))
    }
    new org.apache.spark.sql.sources.BaseRelation {
      override def sqlContext: org.apache.spark.sql.SQLContext =
        org.apache.spark.sql.SQLContext.getOrCreate(spark.sparkContext)
      override def schema: StructType = data.schema
    }
  }

  // ---- spark.readStream.format("graft").load(path) ------------------
  // The same v1 Source as the legacy `graft-commitlog` name, unified
  // under the format (the resolver falls back here because the batch
  // table declares no MICRO_BATCH_READ). Default = the ROW feed
  // (table-schema rows of append commits, failing on change commits —
  // Delta's contract); option("readChangeFeed", "true") = CDF rows;
  // option("skipChangeCommits", "true") = skip change commits.
  // Offsets are COMMIT VERSIONS either way.

  override def sourceSchema(
      sqlContext: org.apache.spark.sql.SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), graft.streaming.CommitLogStream.schemaFor(
      sqlContext.sparkSession, schema, parameters))

  override def createSource(
      sqlContext: org.apache.spark.sql.SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source =
    graft.streaming.CommitLogStream.sourceFor(
      sqlContext.sparkSession, schema, parameters)

  // ---- df.writeStream.format("graft").start(path) --------------------
  // The exactly-once commit-log sink (graft.streaming.CommitLogSink —
  // transaction watermarks make re-delivered micro-batches no-ops),
  // unified under the format name. The partition column resolves like
  // the batch write surface: existing table property, then
  // `partitionBy(c)`, then the partCol/partitionCol options.

  override def createSink(
      sqlContext: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val base = parameters.getOrElse("path",
      sys.error("format(\"graft\") sink needs .start(<table dir>)"))
    val spark = sqlContext.sparkSession
    val bp = new Path(base)
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val declared = SnapshotLog.readManifest(fs, bp)
      .flatMap(_.props.get(SnapshotLog.PartColProp))
    // partitionBy(y, m): comma-joined, declaration order — the
    // SnapshotLog.partColsOf multi-column spelling
    val hinted = (if (partitionColumns.isEmpty) None
      else Some(partitionColumns.mkString(",")))
      .orElse(parameters.get("partCol"))
      .orElse(parameters.get(WriteIntoGraft.PartitionColOption))
    // same mismatch guard as the batch surface: a stream declaring a
    // partitioning that contradicts the table's layout fails at start,
    // never silently writes under the old layout
    def layout(s: String) = SnapshotLog.partColsOf(s).map(_.toLowerCase)
    (declared, hinted) match {
      case (Some(d), Some(h)) if layout(d) != layout(h) =>
        sys.error(if (d.isEmpty)
          s"graft table $base is unpartitioned — drop partitionBy('$h')"
        else s"graft table $base is partitioned by '$d', not '$h'")
      case _ => ()
    }
    // fresh path with no partitionBy: unpartitioned (single hidden
    // partition), matching the batch write surface
    val partCol = declared.orElse(hinted).getOrElse(SnapshotLog.NoPartCol)
    val keys = parameters.get("keys").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    new graft.streaming.CommitLogSink(
      path = base,
      partCol = partCol,
      keys = keys,
      orderCol = parameters.get("orderCol"),
      opCol = parameters.get("opCol"),
      appIdOpt = parameters.get("appId"),
      statsCols = parameters.get("statsCols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      writeCdf = parameters.get("cdf").exists(_.toBoolean),
      autoCompactFiles = parameters.get("autoCompactFiles")
        .map(_.toInt).getOrElse(0))
  }
}

/** A table's CHANGE FEED over a version range, as a read-only DSv2
  * table — the batch half of Delta's `readChangeFeed` option (the
  * streaming half lives in [[graft.streaming.CommitLogStream]]).
  * Schema = table columns + `change_type` + `_commit_version`, typed
  * from the manifest header with zero data-file reads. Same
  * fail-closed design as [[GraftSnapshotTable]]: `newScanBuilder`
  * throws, and [[graft.plans.GraftCatalogRelationRule]] substitutes
  * [[feedPlan]] — a manifest-gated read of exactly the range's
  * materialized feed dirs ([[SnapshotLog.readCdfRange]], which fails
  * loudly on committed versions whose feed is missing rather than
  * under-delivering changes). */
final class GraftChangeFeedTable(
    val base: String,
    val startingVersion: Option[Long],
    val endingVersion: Option[Long])
  extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {

  override def name(): String =
    s"graft.`$base` CHANGES [${startingVersion.getOrElse("first")}, " +
      s"${endingVersion.getOrElse("latest")}]"

  override def schema(): StructType = {
    val spark = SparkSession.active
    val bp = new Path(base)
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tableSchema = SnapshotLog.readManifest(fs, bp).flatMap(_.schema)
      .getOrElse(sys.error(
        s"$base: readChangeFeed needs a committed manifest schema"))
    StructType(tableSchema.fields.toSeq :+
      org.apache.spark.sql.types.StructField("change_type",
        org.apache.spark.sql.types.StringType) :+
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType))
  }

  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    throw new UnsupportedOperationException(
      s"$base: the change feed reads through the planner-integrated " +
        "substitution — install graft.GraftExtensions " +
        "(spark.sql.extensions=graft.GraftExtensions)")

  /** The ranged feed, aligned to [[schema]] (older feed files may lack
    * later columns; casts pin the declared types). */
  def feedPlan(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val sc = schema()
    val raw = SnapshotLog.readCdfRange(spark, base,
        startingVersion, endingVersion)
      .getOrElse(sys.error(
        s"$base has no materialized change feed and no manifest schema"))
    val have = raw.columns.toSet
    raw.select(sc.fields.toSeq.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}
