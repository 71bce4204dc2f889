package graft.plans

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}
import graft.sources.{Catalog, SnapshotLog}

/** Table properties (`SET/UNSET/SHOW TBLPROPERTIES`) and the
  * load-bearing one: `graft.enableChangeDataFeed = true` turns on the
  * change feed for EVERY write path — SQL INSERT (append), DELETE,
  * UPDATE, COPY INTO — without a per-call opt-in, Delta's
  * delta.enableChangeDataFeed re-expressed on the commit-log format. */
class TblPropertiesSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  private def mkTable(prefix: String, db: String): (String, Path, String) = {
    import s.implicits._
    val base = Files.createTempDirectory(prefix).toString + "/tbl"
    val rows = (1L to 60L).map(i => (i, i * 1.5, s"d${i % 3}"))
      .toDF("id", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    val view = Catalog.registerSnapshotLog(s, db, "t1", base, Some("day"))
    (base, new Path(base), view)
  }
  private def fs(bp: Path) =
    bp.getFileSystem(s.sparkContext.hadoopConfiguration)

  test("SET / SHOW / UNSET TBLPROPERTIES roundtrip, metadata-only") {
    val (base, bp, view) = mkTable("graft_props1", "props1")
    val m0 = SnapshotLog.readManifest(fs(bp), bp).get
    val r = s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
      "('owner' = 'etl-team', 'graft.retention.hours' = '48')")
      .collect().head
    assert(r.getString(0) == "SET TBLPROPERTIES" &&
      r.getLong(1) == m0.version + 1)
    val m1 = SnapshotLog.readManifest(fs(bp), bp).get
    assert(m1.files == m0.files, "SET TBLPROPERTIES must be metadata-only")
    assert(m1.props == Map("owner" -> "etl-team",
      "graft.retention.hours" -> "48"))
    val shown = s.sql(s"SHOW TBLPROPERTIES $view").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown == m1.props)
    s.sql(s"ALTER TABLE $view UNSET TBLPROPERTIES ('owner')")
    assert(SnapshotLog.readManifest(fs(bp), bp).get.props
      == Map("graft.retention.hours" -> "48"))
    // properties survive OPTIMIZE and ride RESTORE with the data
    s.sql(s"OPTIMIZE $view")
    assert(SnapshotLog.readManifest(fs(bp), bp).get.props.nonEmpty,
      "properties must survive maintenance")
  }

  test("a property key with an embedded quote round-trips through SET and UNSET") {
    val (base, bp, view) = mkTable("graft_props_q", "propsq")
    // the SQL ''-escape: key o'brien, value it''s — both must survive
    s.sql(s"ALTER TABLE $view SET TBLPROPERTIES ('o''brien' = 'it''s')")
    assert(SnapshotLog.readManifest(fs(bp), bp).get.props
      == Map("o'brien" -> "it's"))
    // UNSET must accept the same escape, or the key is write-only
    s.sql(s"ALTER TABLE $view UNSET TBLPROPERTIES ('o''brien')")
    assert(SnapshotLog.readManifest(fs(bp), bp).get.props.isEmpty,
      "quoted key must UNSET through the same SQL surface")
  }

  test("DROP COLUMNS multi-column list; unbalanced parens fall to the delegate") {
    val (base, bp, view) = mkTable("graft_props_dc", "propsdc")
    s.sql(s"ALTER TABLE $view ADD COLUMNS (extra1 STRING, extra2 INT)")
    // one statement, two drops (sequential commits, left-to-right)
    s.sql(s"ALTER TABLE $view DROP COLUMNS (extra1, extra2)")
    val sc = SnapshotLog.readManifest(fs(bp), bp).get.schema.get
    assert(!sc.fieldNames.exists(n => n == "extra1" || n == "extra2"), sc)
    // unbalanced parens must NOT silently parse as a drop
    intercept[Exception] {
      s.sql(s"ALTER TABLE $view DROP COLUMN (value")
    }
    assert(SnapshotLog.readManifest(fs(bp), bp).get.schema.get
      .fieldNames.contains("value"), "malformed DROP must not drop anything")
  }

  test("enableChangeDataFeed property turns on CDF for every write path") {
    import s.implicits._
    val (base, bp, view) = mkTable("graft_props2", "props2")
    assert(SnapshotLog.readCdf(s, base).isEmpty, "no feed before opt-in")
    s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
      s"('${SnapshotLog.CdfProp}' = 'true')")

    // SQL INSERT (append path): insert-typed feed rows, no opt-in arg
    s.sql(s"INSERT INTO $view VALUES (1001, 9.0, 'd1'), (1002, 9.5, 'd2')")
    val f1 = SnapshotLog.readCdf(s, base).get
    assert(f1.filter(col("change_type") === "insert").count() == 2)

    // DELETE: delete-typed rows
    s.sql(s"DELETE FROM $view WHERE id = 1001")
    val f2 = SnapshotLog.readCdf(s, base).get
    assert(f2.filter(col("change_type") === "delete")
      .select("id").as[Long].collect().toSeq == Seq(1001L))

    // UPDATE: both images
    s.sql(s"UPDATE $view SET value = value + 1 WHERE id = 1002")
    val f3 = SnapshotLog.readCdf(s, base).get
    assert(f3.filter(col("change_type") === "update_preimage").count() == 1)
    assert(f3.filter(col("change_type") === "update_postimage").count() == 1)

    // COPY INTO (appendBatch underneath): feed rows too
    val land = Files.createTempDirectory("graft_props_land").toString
    Seq((2001L, 1.0, "d0"), (2002L, 2.0, "d1"))
      .toDF("id", "value", "day").coalesce(1).write.mode("overwrite")
      .parquet(land)
    s.sql(s"COPY INTO $view FROM '$land' FILEFORMAT = PARQUET " +
      "PATTERN = 'part-*.parquet'")
    val f4 = SnapshotLog.readCdf(s, base).get
    assert(f4.filter(col("change_type") === "insert").count() == 4)

    // the feed versions line up with the commits and stream end-to-end
    val feedVersions = SnapshotLog.cdfVersions(fs(bp), bp)
    assert(feedVersions.size == 4, s"four fed commits, got $feedVersions")

    // UNSET turns it back off
    s.sql(s"ALTER TABLE $view UNSET TBLPROPERTIES ('${SnapshotLog.CdfProp}')")
    s.sql(s"INSERT INTO $view VALUES (3001, 1.0, 'd0')")
    assert(SnapshotLog.cdfVersions(fs(bp), bp).size == 4,
      "writes after UNSET must not feed")
  }

  test("clone copies properties; overwrite CDF emits deletes + inserts") {
    import s.implicits._
    val (base, bp, view) = mkTable("graft_props3", "props3")
    s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
      s"('${SnapshotLog.CdfProp}' = 'true')")
    val cloneLoc = Files.createTempDirectory("graft_props3c").toString + "/fork"
    s.sql(s"CREATE TABLE props3.fork SHALLOW CLONE $view LOCATION '$cloneLoc'")
    assert(SnapshotLog.readManifest(fs(new Path(cloneLoc)),
      new Path(cloneLoc)).get.cdfEnabled,
      "a clone must inherit table properties")

    // INSERT OVERWRITE with CDF on: old rows typed delete, new typed insert
    SnapshotLog.appendBatch(s, base,
      Seq((9001L, 1.0, "d0")).toDF("id", "value", "day"),
      "day", batchId = 50, overwrite = true)
    val feed = SnapshotLog.readCdf(s, base).get
    val last = feed.agg(max(col("_commit_version"))).head.getLong(0)
    val byType = feed.filter(col("_commit_version") === last)
      .groupBy("change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("delete" -> 60L, "insert" -> 1L),
      s"overwrite feed must be 60 deletes + 1 insert, got $byType")
  }
}
