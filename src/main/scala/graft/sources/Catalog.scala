package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog discovery — the Spark-native form of the reference's Glue
  * Crawler (ref `infrastructure/main.tf:147-179`): one table per
  * first-level directory prefix under a root, schemas inferred from the
  * files themselves, registered into `spark.catalog` so every table is
  * queryable BY NAME through SQL.
  *
  * Persistence model: the reference's Step Function re-runs the crawler
  * on every pipeline trigger (ref `main.tf:364-371`) — the durable truth
  * is the data layout, and the catalog is a recoverable projection of it.
  * [[crawl]] is that recovery: after a session restart (or against a
  * brand-new cluster) one call re-materializes every table definition
  * from the warehouse directory alone. With a persistent metastore
  * configured (`spark.sql.catalogImplementation=hive`) the definitions
  * additionally survive restarts natively; nothing here assumes it.
  *
  * Schema evolution mirrors the crawler's `UPDATE_IN_DATABASE` policy
  * (ref `main.tf:170-173`): a re-crawl replaces a table whose on-disk
  * schema drifted from the registered one (new columns appear; the
  * table definition follows the files). Partition evolution is handled
  * the same way: every crawl of a partitioned layout re-runs
  * `MSCK REPAIR TABLE`, so partition directories that appeared since the
  * table was registered (the common incremental case — a new `fecha_dia`
  * day landing) become visible to name-based reads without dropping the
  * table.
  *
  * All filesystem access goes through the Hadoop [[FileSystem]] API
  * resolved from the root path's scheme, so the same crawl works on
  * `file://`, HDFS, and S3A object stores — the reference's crawler is
  * S3-native, and a crawler that can only walk a local disk would be
  * useless on the warehouses it models.
  *
  * Scale: registration is metadata-only — no data is read beyond parquet
  * footers for schema inference, and partitioned layouts keep partition
  * pruning (recovered via `MSCK REPAIR TABLE`). A 100 TB warehouse
  * crawls in seconds because the crawl cost is O(tables + partitions),
  * not O(bytes).
  */
object Catalog {

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listDir(fs: FileSystem, p: Path): Array[FileStatus] =
    if (fs.exists(p)) fs.listStatus(p) else Array.empty

  /** Directories that hold a readable parquet table: contain at least one
    * `.parquet` file directly or inside Hive-style `key=value` partition
    * subdirs. */
  private def isTableDir(fs: FileSystem, dir: Path): Boolean = {
    def scan(d: Path, depth: Int): Boolean = {
      val entries = listDir(fs, d)
      entries.exists(f => f.isFile && f.getPath.getName.endsWith(".parquet")) ||
      (depth > 0 && entries.exists(f =>
        f.isDirectory && f.getPath.getName.contains("=") &&
          scan(f.getPath, depth - 1)))
    }
    scan(dir, 3)
  }

  /** Sanitize a directory name into a SQL identifier (the crawler does
    * the same prefix→table-name normalization). */
  private def tableName(dir: String): String =
    dir.toLowerCase.replaceAll("[^a-z0-9_]", "_")

  /** Register one external parquet table by location; schema and
    * partition columns are inferred from the layout. Replaces an
    * existing definition when the on-disk schema drifted
    * (`UPDATE_IN_DATABASE`); refreshes partition metadata on EVERY call
    * for partitioned layouts, so partitions added since registration are
    * discovered by re-crawls. Returns the qualified table name. */
  def registerExternal(
      spark: SparkSession, db: String, name: String, path: String): String = {
    val qualified = s"$db.$name"
    val onDisk = spark.read.parquet(path).schema
    val stale = spark.catalog.tableExists(qualified) &&
      spark.table(qualified).schema.fieldNames.toSet != onDisk.fieldNames.toSet
    if (stale) spark.sql(s"DROP TABLE IF EXISTS $qualified")
    if (!spark.catalog.tableExists(qualified)) {
      spark.sql(
        s"CREATE TABLE IF NOT EXISTS $qualified USING parquet LOCATION '$path'")
    }
    // Partitioned layouts: (re)load partition metadata into the catalog so
    // partition pruning works on name-based reads. Runs on every crawl, not
    // just creation — a re-crawl must pick up partition directories that
    // landed since the table was registered (UPDATE_IN_DATABASE semantics).
    val p = new Path(path)
    if (partitionedLayout(fsFor(spark, p), p))
      spark.sql(s"MSCK REPAIR TABLE $qualified")
    qualified
  }

  private def partitionedLayout(fs: FileSystem, dir: Path): Boolean =
    listDir(fs, dir).exists(f => f.isDirectory && f.getPath.getName.contains("="))

  /** A [[SnapshotLog]] commit-log table: a `_log/` dir holding version
    * manifests. Its data files are a manifest-selected subset of what's
    * on disk, so it must NOT be registered as a plain LOCATION-based
    * external table (that would read orphans and time-travel versions). */
  private def isSnapshotLogDir(fs: FileSystem, dir: Path): Boolean =
    listDir(fs, new Path(dir, "_log")).exists { f =>
      val n = f.getPath.getName
      f.isFile && n.startsWith("v") && n.endsWith(".txt")
    }

  /** Register a commit-log table for SQL by name, PINNED at its current
    * committed version: the view's plan embeds a
    * [[SnapshotRelation planner-integrated relation]] over the
    * manifest's exact file list, so name-based readers keep snapshot
    * isolation — commits after the crawl stay invisible until a
    * re-crawl re-pins (exactly the crawler-refresh model the directory
    * tables follow) — AND inherit manifest file skipping: a SQL WHERE
    * on a stats/bloom-covered column prunes files inside Spark's
    * planning ([[SnapshotFileIndex]]). A temp view rather than a
    * catalog table because SQL DDL cannot express a manifest-selected
    * file list as a LOCATION. Returns the view name, `<db>_<name>`
    * (temp views live outside databases). */
  def registerSnapshotLog(
      spark: SparkSession, db: String, name: String, path: String,
      partCol: Option[String] = None): String = {
    val viewName = s"${db}_$name"
    // an EMPTY table (TRUNCATE, or a DELETE that drained every
    // partition) still pins: the schema-header empty frame replaces
    // the stale snapshot — only a never-committed path pins nothing
    // pruning wants a REAL column; "" (explicitly unpartitioned) still
    // registers for DML below, it just has no partition predicates
    val pruneCol = partCol.filter(_.nonEmpty)
    SnapshotRelation.read(spark, path, partCol = pruneCol)
      .orElse(SnapshotLog.read(spark, path, pruneCol)) match {
      case Some(df) => df.createOrReplaceTempView(viewName)
      case None => // claimed but never-committed table: nothing to pin
    }
    // partCol-declared tables additionally become SQL-DML targets:
    // `DELETE FROM <view> WHERE ...` / `UPDATE <view> SET ...` route
    // through the commit log ([[graft.plans.SnapshotDmlRule]]) and
    // re-pin the view at the committed version
    partCol.foreach(pc => dmlTargets.put(viewName, (path, pc, db, name)))
    viewName
  }

  /** Remove a snapshot view's registration (SQL `DROP TABLE`): the
    * name stops resolving and stops being a DML/maintenance target.
    * The commit log and its data are untouched — external-table
    * semantics; `DROP TABLE … PURGE` deletes the directory too. */
  def unregister(spark: SparkSession, viewName: String): Unit = {
    dmlTargets.remove(viewName)
    spark.catalog.dropTempView(viewName)
  }

  /** SQL-DML-addressable snapshot tables: view name →
    * (table path, partition column, db, name). Registered by
    * [[registerSnapshotLog]] when the caller declares the partition
    * column (DML planning needs it); a real deployment would carry
    * this in table properties. */
  private[graft] val dmlTargets =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String, String, String)]()

  private[graft] def dmlTarget(viewName: String): Option[(String, String, String, String)] =
    Option(dmlTargets.get(viewName)).orElse(catalogTarget(viewName))

  /** Fallback resolution for DOTTED names: `<cat>.<ns…>.<t>` where
    * `<cat>` is a configured [[GraftCatalog]] — lets every maintenance
    * verb (OPTIMIZE / VACUUM / RESTORE / DESCRIBE …) and DML statement
    * address catalog tables directly, with the directory and partition
    * column resolved from the catalog and manifest instead of a
    * registration call. Single-part names never reach this (the
    * registry map stays the only authority for them). */
  private def catalogTarget(name: String): Option[(String, String, String, String)] = {
    val parts = name.split("\\.").toSeq
    if (parts.size < 3) return None
    val spark = try SparkSession.getActiveSession.getOrElse(return None)
      catch { case _: Exception => return None }
    val gc = try {
      spark.sessionState.catalogManager.catalog(parts.head) match {
        case g: GraftCatalog => g
        case _ => return None
      }
    } catch { case _: Exception => return None }
    try {
      gc.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        parts.tail.init.toArray, parts.last)) match {
        case t: GraftSnapshotTable =>
          t.partCol.map(pc => (t.base, pc,
            ("graftcat__" + parts.init.mkString("__")).toLowerCase,
            parts.last.toLowerCase))
        case _ => None
      }
    } catch { case _: Exception => None }
  }

  /** Crawl `root`: create database `db` if absent, register one external
    * table per qualifying first-level prefix. Idempotent; re-crawling
    * refreshes drifted schemas, discovers new prefixes, and recovers
    * newly-landed partitions. Returns the qualified names registered,
    * sorted. */
  def crawl(spark: SparkSession, root: String, db: String): Seq[String] = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val rootPath = new Path(root)
    val fs = fsFor(spark, rootPath)
    val (logTables, plain) = listDir(fs, rootPath)
      .filter(_.isDirectory).map(_.getPath).sortBy(_.getName)
      .partition(isSnapshotLogDir(fs, _))
    val registered =
      plain.filter(isTableDir(fs, _)).map(d =>
        registerExternal(spark, db, tableName(d.getName), d.toString)) ++
        logTables.map { d =>
          // every write surface stamps the partition column into the
          // manifest ("" = unpartitioned) — a crawl can therefore
          // register the table as a full SQL-DML target with no
          // caller-supplied layout knowledge
          val pc = SnapshotLog.readManifest(fs, d)
            .flatMap(_.props.get(SnapshotLog.PartColProp))
          registerSnapshotLog(spark, db, tableName(d.getName), d.toString, pc)
        }
    registered.toSeq.sorted
  }

  /** Managed-table write: `saveAsTable` into the session warehouse — the
    * COPY-into-warehouse leg (ref `sql/ddl_staging.sql:40-43`) without
    * the external system. Overwrite = full refresh, matching the
    * reference's TRUNCATE+COPY. */
  def saveManaged(df: DataFrame, db: String, name: String): String = {
    val spark = df.sparkSession
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val qualified = s"$db.$name"
    df.write.mode("overwrite").saveAsTable(qualified)
    qualified
  }
}
