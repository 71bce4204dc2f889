package graft.plans

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}
import graft.sources.{Catalog, SnapshotLog}

/** `TRUNCATE TABLE` (metadata-only delete-everything that keeps
  * exactly-once watermarks and time travel) and `DROP TABLE [PURGE]`
  * (unregistration with external-table semantics) on commit-log
  * views. */
class TruncateDropSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  private def mk(name: String): (String, Path,
      org.apache.hadoop.fs.FileSystem, String) = {
    import s.implicits._
    val base = Files.createTempDirectory(s"graft_trunc_$name").toString + "/tbl"
    val rows = (1L to 90L).map(i => (i, i * 1.0, s"d${i % 3}"))
      .toDF("id", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 4, opCol = None, writeCdf = false,
      extraAffected = Nil, txn = Some(("app1", 7L)))
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    (base, bp, fs, Catalog.registerSnapshotLog(s, "trunc", name, base, Some("day")))
  }

  test("TRUNCATE empties the table metadata-only; watermarks and time travel survive") {
    val (base, bp, fs, view) = mk("t1")
    val m1 = SnapshotLog.readManifest(fs, bp).get
    val res = s.sql(s"TRUNCATE TABLE $view").collect().head
    assert(res.getString(0) == "TRUNCATE" && res.getLong(1) == m1.version + 1)
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 0)
    val m2 = SnapshotLog.readManifest(fs, bp).get
    assert(m2.files.isEmpty && m2.op.contains("TRUNCATE"))
    assert(m2.txns == Map("app1" -> 7L),
      "exactly-once watermarks must survive a truncate")
    assert(m2.schema.get.fieldNames.toSeq == Seq("id", "value", "day"),
      "schema survives an empty table")
    // time travel still reads the pre-truncate snapshot
    assert(SnapshotLog.readVersion(s, base, m1.version).get.count() == 90)
    // the data files still exist on disk (vacuum's job, not truncate's)
    assert(m1.allFiles.forall(f => fs.exists(new Path(bp, f))))
    // a truncate of an already-empty table is a no-op, not a new version
    assert(s.sql(s"TRUNCATE TABLE $view").collect().head.getLong(1) == m2.version)
    // inserts after truncate land in the empty table
    s.sql(s"INSERT INTO $view VALUES (500, 1.5, 'd0')")
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 1)
  }

  test("TRUNCATE with the change feed on publishes the snapshot as deletes") {
    val (base, bp, fs, view) = mk("t2")
    s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
      s"('${SnapshotLog.CdfProp}' = 'true')")
    s.sql(s"TRUNCATE TABLE $view")
    val v = SnapshotLog.readManifest(fs, bp).get.version
    val feed = SnapshotLog.readCdf(s, base).get
      .filter(col("_commit_version") === v)
    assert(feed.count() == 90)
    assert(feed.select("change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("delete"))
  }

  test("DROP TABLE unregisters; the commit log survives and re-registers; PURGE deletes it") {
    val (base, bp, fs, view) = mk("t3")
    s.sql(s"DROP TABLE $view")
    assert(Catalog.dmlTarget(view).isEmpty, "DML target must unregister")
    intercept[Exception](s.sql(s"SELECT COUNT(*) FROM $view").collect())
    // external-table semantics: the data survives and re-registers
    assert(SnapshotLog.readManifest(fs, bp).isDefined)
    val again = Catalog.registerSnapshotLog(s, "trunc", "t3", base, Some("day"))
    assert(s.sql(s"SELECT COUNT(*) FROM $again").head.getLong(0) == 90)

    s.sql(s"DROP TABLE $again PURGE")
    assert(!fs.exists(bp), "PURGE must delete the table directory")

    // DROP TABLE on an unregistered name keeps Spark's own meaning
    intercept[Exception](s.sql("DROP TABLE no_such_snapshot_table"))
  }
}
