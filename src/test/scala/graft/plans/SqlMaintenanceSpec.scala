package graft.plans

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}
import graft.sources.{Catalog, SnapshotLog}

/** SQL maintenance verbs through the delegating parser extension:
  * `OPTIMIZE [ZORDER BY (...)]`, `VACUUM [RETAIN n HOURS]`, and
  * `RESTORE … TO VERSION AS OF v` run the engine's own maintenance
  * primitives on registered commit-log views — while every statement
  * the interceptor does not claim (including these verbs on
  * unregistered names) parses through Spark's own grammar untouched. */
class SqlMaintenanceSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  private def mkTable(prefix: String, db: String): (String, Path, String) = {
    import s.implicits._
    val base = Files.createTempDirectory(prefix).toString + "/tbl"
    val rows = (1L to 300L).map(i => (i, i * 1.5, s"d${i % 3}"))
      .toDF("id", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Seq("id"),
      clusterBy = Nil, clusterFiles = 8, opCol = None, writeCdf = false)
    val view = Catalog.registerSnapshotLog(s, db, "t1", base, Some("day"))
    (base, new Path(base), view)
  }
  private def fs(bp: Path) =
    bp.getFileSystem(s.sparkContext.hadoopConfiguration)

  test("OPTIMIZE compacts in one commit, materializes DVs, keeps stats") {
    val (base, bp, view) = mkTable("graft_sqlopt", "maint1")
    s.sql(s"DELETE FROM $view WHERE id % 10 = 3") // DVs
    val m1 = SnapshotLog.readManifest(fs(bp), bp).get
    assert(m1.dvs.nonEmpty)

    val r = s.sql(s"OPTIMIZE $view").collect().head
    assert(r.getString(0) == "OPTIMIZE")
    assert(r.getLong(3) < r.getLong(2), s"files must shrink: $r")
    val m2 = SnapshotLog.readManifest(fs(bp), bp).get
    assert(m2.version == m1.version + 1, "whole-table OPTIMIZE is ONE commit")
    assert(m2.dvs.isEmpty, "OPTIMIZE must materialize deletion vectors")
    assert(m2.files.values.flatten.toSeq.forall(f =>
      m2.stats.get(f).exists(_.contains("id"))),
      "stats bounds must be re-recorded on rewritten files")
    // the SAME view name immediately reads the optimized snapshot
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 270)
  }

  test("OPTIMIZE ZORDER BY clusters files into selective ranges") {
    val (base, bp, view) = mkTable("graft_sqlzorder", "maint2")
    s.sql(s"OPTIMIZE $view ZORDER BY (id)")
    val m = SnapshotLog.readManifest(fs(bp), bp).get
    // every partition's files now carry id bounds, and a point probe
    // on one id prunes to a strict file subset within its partition
    assert(m.files.values.flatten.toSeq.forall(f =>
      m.stats.get(f).exists(_.contains("id"))))
    val hit = SnapshotLog.filesForRange(m, "id", 10.0, 10.0)
    assert(hit.size < m.allFiles.size,
      s"clustered bounds must prune: ${hit.size} of ${m.allFiles.size}")
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 300)
  }

  test("RESTORE rolls back append-only; VACUUM reclaims after expiry") {
    val (base, bp, view) = mkTable("graft_sqlrestore", "maint3")
    val sum0 = s.sql(s"SELECT SUM(value) FROM $view").head.getDouble(0)
    s.sql(s"UPDATE $view SET value = 0 WHERE id % 2 = 0") // bad deploy
    assert(s.sql(s"SELECT SUM(value) FROM $view").head.getDouble(0) < sum0)

    val r = s.sql(s"RESTORE TABLE $view TO VERSION AS OF 1").collect().head
    assert(r.getString(0) == "RESTORE" && r.getLong(2) == 1L)
    assert(s.sql(s"SELECT SUM(value) FROM $view").head.getDouble(0) == sum0)
    val ops = SnapshotLog.history(s, base).select("operation")
      .collect().map(_.getString(0)).toSeq
    assert(ops.contains("RESTORE") && ops.contains("UPDATE"),
      s"append-only rollback keeps the bad version for audit: $ops")

    // restoring to a nonexistent version fails loudly
    val e = intercept[RuntimeException](
      s.sql(s"RESTORE $view TO VERSION AS OF 99"))
    assert(e.getMessage.contains("RESTORE target"))

    // pre-expiry VACUUM reclaims nothing (everything referenced) …
    assert(s.sql(s"VACUUM $view RETAIN 0 HOURS").head.getLong(1) == 0L)
    // … post-expiry it reclaims the UPDATE's rewrite and nothing live.
    // Without RETAIN, the table's retention PROPERTY governs (Delta's
    // deletedFileRetentionDuration): at the 24h default the young
    // orphans survive; at a 0-hour property they reclaim.
    SnapshotLog.expireVersions(s, base, keepLast = 1)
    assert(s.sql(s"VACUUM $view").head.getLong(1) == 0L,
      "default 24h retention must protect young unreferenced files")
    s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
      s"('${SnapshotLog.VacuumRetentionProp}' = '0')")
    assert(s.sql(s"VACUUM $view").head.getLong(1) > 0L,
      "the table's retention property must govern a bare VACUUM")
    assert(s.sql(s"SELECT SUM(value) FROM $view").head.getDouble(0) == sum0)
  }

  test("DESCRIBE HISTORY and SHOW PARTITIONS answer metadata-only") {
    val (base, bp, view) = mkTable("graft_sqlintro", "maint5")
    s.sql(s"DELETE FROM $view WHERE id % 10 = 3") // DVs change live counts
    val h = s.sql(s"DESCRIBE HISTORY $view").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    assert(h.head.getString(2) == "DELETE_DV" && h.head.getLong(6) == 270L)
    val parts = s.sql(s"SHOW PARTITIONS $view").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(parts.keySet == Set("d0", "d1", "d2"))
    assert(parts.values.sum == 270L,
      "SHOW PARTITIONS must report LIVE counts (DVs subtracted)")
    // SHOW PARTITIONS on a non-registered name keeps Spark's own error
    intercept[Exception](s.sql("SHOW PARTITIONS not_a_snapshot_view"))
  }

  test("CHECK constraints gate every write path; versioned with the data") {
    import s.implicits._
    val (base, bp, view) = mkTable("graft_sqlcheck", "maint6")
    s.sql(s"ALTER TABLE $view ADD CONSTRAINT pos CHECK (value > 0)")
    val m = SnapshotLog.readManifest(fs(bp), bp).get
    assert(m.constraints == Map("pos" -> "value > 0"))

    def rejected(body: => Any): Unit = {
      val r = scala.util.Try(body)
      assert(r.isFailure, "expected a CHECK rejection")
      val msg = Iterator.iterate(r.failed.get)(_.getCause)
        .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msg.contains("CHECK"), s"not a CHECK failure: $msg")
    }

    // upsert, append (SQL INSERT), and UPDATE all gate
    rejected(SnapshotLog.upsertBatch(s, base,
      Seq((999L, -1.0, "d0")).toDF("id", "value", "day"), Seq("id"), "id",
      "day", batchId = 9, maxRetries = 5, statsCols = Nil, clusterBy = Nil,
      clusterFiles = 1, opCol = None, writeCdf = false))
    rejected(s.sql(s"INSERT INTO $view VALUES (998, -5.0, 'd0')"))
    rejected(s.sql(s"UPDATE $view SET value = -2 WHERE id = 5"))
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 300,
      "rejected batches must leave the table untouched")

    // NULL passes (SQL CHECK semantics), and a CDC delete marker's
    // payload is exempt (it never lands in the table)
    s.sql(s"INSERT INTO $view (id, day) VALUES (997, 'd0')")
    assert(s.sql(s"SELECT value FROM $view WHERE id = 997").head.isNullAt(0))
    SnapshotLog.upsertBatch(s, base,
      Seq((997L, -99.0, "d0", "D")).toDF("id", "value", "day", "op"),
      Seq("id"), "id", "day", batchId = 10, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 1, opCol = Some("op"), writeCdf = false)
    // (the Scala-API write doesn't re-pin the SQL view — read the log)
    assert(SnapshotLog.read(s, base).get
      .filter(col("id") === 997L).count() == 0)

    // a constraint the live data violates is refused with the count
    rejected(s.sql(s"ALTER TABLE $view ADD CONSTRAINT low CHECK (value < 10)"))
    assert(SnapshotLog.readManifest(fs(bp), bp).get.constraints.size == 1)

    // constraints survive OPTIMIZE and roll BACK with RESTORE
    s.sql(s"OPTIMIZE $view")
    assert(SnapshotLog.readManifest(fs(bp), bp).get
      .constraints.contains("pos"), "constraints must survive maintenance")
    s.sql(s"RESTORE $view TO VERSION AS OF 1")
    assert(SnapshotLog.readManifest(fs(bp), bp).get.constraints.isEmpty,
      "RESTORE to a pre-constraint version must roll the constraint back")
    s.sql(s"INSERT INTO $view VALUES (996, -1.0, 'd0')") // gate is gone
    assert(s.sql(s"SELECT COUNT(*) FROM $view WHERE id = 996")
      .head.getLong(0) == 1)
  }

  test("SHALLOW CLONE: zero-copy fork, copy-on-write, vacuum-safe") {
    val (base, bp, view) = mkTable("graft_sqlclone", "maint7")
    val loc = Files.createTempDirectory("graft_sqlclone_dst").toString + "/fork"
    val r = s.sql(s"CREATE TABLE maint7.fork SHALLOW CLONE $view " +
      s"LOCATION '$loc'").collect().head
    val forkView = r.getString(2)
    val hfs = fs(bp)
    assert(!hfs.exists(new Path(s"$loc/data")), "zero bytes must be copied")
    assert(s.sql(s"SELECT COUNT(*) FROM $forkView").head.getLong(0) == 300)

    // copy-on-write divergence: one partition materializes locally
    s.sql(s"UPDATE $forkView SET value = 0 WHERE day = 'd1'")
    val mF = SnapshotLog.readManifest(hfs, new Path(loc)).get
    assert(mF.files("d1").forall(!_.startsWith("/")) &&
      mF.files("d0").forall(_.startsWith("/")))
    assert(s.sql(s"SELECT SUM(value) FROM $view").head.getDouble(0) > 0 &&
      s.sql(s"SELECT COUNT(*) FROM $view WHERE value = 0").head.getLong(0) == 0,
      "the source must be untouched by the clone's write")

    // the clone's vacuum can never reclaim source files
    SnapshotLog.vacuum(s, loc, retentionMs = 0L)
    assert(s.sql(s"SELECT COUNT(*) FROM $forkView").head.getLong(0) == 300)
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 300)

    // a second clone into the same location is refused
    val dup = scala.util.Try(s.sql(
      s"CREATE TABLE maint7.fork2 SHALLOW CLONE $view LOCATION '$loc'"))
    assert(dup.isFailure)
  }

  test("ANALYZE and CREATE BLOOMFILTER INDEX commit metadata-only") {
    val (base, bp, view) = mkTable("graft_sqlanalyze", "maint8")
    val hfs = fs(bp)
    val m1 = SnapshotLog.readManifest(hfs, bp).get

    val a = s.sql(s"ANALYZE $view COMPUTE STATISTICS FOR COLUMNS value")
      .collect().head
    assert(a.getString(0) == "ANALYZE" && a.getLong(1) == m1.version + 1)
    val m2 = SnapshotLog.readManifest(hfs, bp).get
    assert(m2.files == m1.files, "ANALYZE must be metadata-only")
    assert(m2.allFiles.forall(f => m2.stats.get(f).exists(_.contains("value"))))
    // the fresh bounds actually prune
    assert(SnapshotLog.filesForRange(m2, "value", 1.0, 2.0).size
      < m2.allFiles.size)

    val b = s.sql(s"CREATE BLOOMFILTER INDEX ON $view (id)").collect().head
    assert(b.getString(0) == "CREATE BLOOMFILTER INDEX")
    val m3 = SnapshotLog.readManifest(hfs, bp).get
    assert(m3.files == m2.files, "bloom build must be metadata-only")
    assert(m3.allFiles.forall(f => m3.blooms.get(f).exists(_.contains("id"))))
    assert(SnapshotLog.filesForKey(m3, "id", 7L).size < m3.allFiles.size)
  }

  test("ALTER TABLE ADD COLUMNS evolves the schema metadata-only") {
    val (base, bp, view) = mkTable("graft_sqladdcol", "maint5")
    val m0 = SnapshotLog.readManifest(fs(bp), bp).get
    val r = s.sql(
      s"ALTER TABLE $view ADD COLUMNS (note STRING, score DECIMAL(10,2))")
      .collect().head
    assert(r.getString(0) == "ADD COLUMNS" && r.getLong(1) == m0.version + 1)
    val m1 = SnapshotLog.readManifest(fs(bp), bp).get
    assert(m1.files == m0.files && m1.stats == m0.stats,
      "ADD COLUMNS must be metadata-only")
    // every existing row reads the new columns as NULL immediately
    val nulls = s.sql(
      s"SELECT COUNT(*) FROM $view WHERE note IS NULL AND score IS NULL")
      .head.getLong(0)
    assert(nulls == 300L, "old rows must backfill NULL on the new columns")
    // a duplicate add fails loudly
    intercept[Exception](s.sql(s"ALTER TABLE $view ADD COLUMNS (note STRING)"))
    // and the next write may carry the evolved shape
    import s.implicits._
    SnapshotLog.appendBatch(s, base,
      Seq((1001L, 5.0, "d1", "hi", BigDecimal("9.50")))
        .toDF("id", "value", "day", "note", "score"),
      "day", batchId = 99)
    SnapshotDml.repin(s, view)
    assert(s.sql(s"SELECT note FROM $view WHERE id = 1001").head.getString(0)
      == "hi")
    assert(s.sql(s"SELECT COUNT(*) FROM $view WHERE note IS NULL")
      .head.getLong(0) == 300L)
  }

  test("OPTIMIZE WHERE compacts only the matching partitions") {
    val (base, bp, view) = mkTable("graft_sqloptw", "maint6")
    val m0 = SnapshotLog.readManifest(fs(bp), bp).get
    assert(m0.files.values.forall(_.size > 1), "need fragmented partitions")
    val r = s.sql(s"OPTIMIZE $view WHERE day = 'd1'").collect().head
    assert(r.getString(0) == "OPTIMIZE")
    val m1 = SnapshotLog.readManifest(fs(bp), bp).get
    assert(m1.files("d1").size == 1, "selected partition must compact")
    assert(m1.files("d0") == m0.files("d0") && m1.files("d2") == m0.files("d2"),
      "unselected partitions must be untouched")
    intercept[Exception](s.sql(s"OPTIMIZE $view WHERE day = 'nope'"))
  }

  test("VACUUM DRY RUN reports reclaimable files without deleting") {
    val (base, bp, view) = mkTable("graft_sqlvacdry", "maint7")
    val before = SnapshotLog.read(s, base).get.count()
    s.sql(s"OPTIMIZE $view") // old fragments become historical
    SnapshotLog.expireVersions(s, base, keepLast = 1)
    val dry = s.sql(s"VACUUM $view RETAIN 0 HOURS DRY RUN").collect().head
    assert(dry.getString(0) == "VACUUM DRY RUN" && dry.getLong(1) > 0,
      s"dry run must count the reclaimable fragments, got $dry")
    assert(SnapshotLog.read(s, base).get.count() == before,
      "dry run must not delete anything")
    val real = s.sql(s"VACUUM $view RETAIN 0 HOURS").collect().head
    assert(real.getLong(1) == dry.getLong(1),
      s"the real pass must reclaim exactly what the dry run counted")
    assert(SnapshotLog.read(s, base).get.count() == before,
      "the live snapshot survives vacuum")
  }

  test("RESTORE TO TIMESTAMP AS OF resolves the version by commit time") {
    val (base, bp, view) = mkTable("graft_sqlrests", "maint8")
    val sum0 = s.sql(s"SELECT SUM(value) FROM $view").head.getDouble(0)
    Thread.sleep(1200) // second-precision timestamps need daylight
    val mid = java.time.LocalDateTime.ofInstant(
      java.time.Instant.now(), java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
    Thread.sleep(1200)
    s.sql(s"UPDATE $view SET value = value + 100")
    assert(s.sql(s"SELECT SUM(value) FROM $view").head.getDouble(0) > sum0)
    val r = s.sql(s"RESTORE $view TO TIMESTAMP AS OF '$mid'").collect().head
    assert(r.getString(0) == "RESTORE")
    assert(s.sql(s"SELECT SUM(value) FROM $view").head.getDouble(0) == sum0,
      "restore-by-timestamp must land on the pre-update version")
    // an instant before the table existed fails loudly
    intercept[Exception](
      s.sql(s"RESTORE $view TO TIMESTAMP AS OF '1999-01-01'"))
  }

  test("REFRESH TABLE re-pins a registered view at the live version") {
    import s.implicits._
    val (base, bp, view) = mkTable("graft_sqlrefresh", "maint5")
    assert(s.table(view).count() == 300L)
    // out-of-band append (Scala API, not the view): the pinned view
    // must NOT move — registration pins a snapshot by design
    SnapshotLog.appendBatch(s, base,
      (1000L to 1049L).map(i => (i, i * 1.5, s"d${i % 3}"))
        .toDF("id", "value", "day"), "day", batchId = 9)
    assert(s.table(view).count() == 300L, "view pins its snapshot")
    val r = s.sql(s"REFRESH TABLE $view").collect()
    assert(r.head.getString(0) == "REFRESH")
    assert(s.table(view).count() == 350L, "REFRESH re-pins at live")
    // bare REFRESH spelling works too; idempotent
    s.sql(s"REFRESH $view").collect()
    assert(s.table(view).count() == 350L)
    // REFRESH on an unregistered name keeps Spark's own semantics
    // (native REFRESH TABLE on a temp view succeeds as a no-op)
    (1L to 3L).toDF("x").createOrReplaceTempView("plain_tv")
    s.sql("REFRESH TABLE plain_tv").collect()
    assert(s.table("plain_tv").count() == 3L)
  }

  test("everything the interceptor does not claim delegates untouched") {
    val (_, _, view) = mkTable("graft_sqldelegate", "maint4")
    // the verbs on an UNREGISTERED name keep Spark's own parse error
    intercept[Exception](s.sql("OPTIMIZE definitely_not_registered"))
    intercept[Exception](s.sql("VACUUM definitely_not_registered"))
    // a query merely CONTAINING the keyword is untouched
    assert(s.sql(s"SELECT 'OPTIMIZE $view' AS x").head.getString(0)
      == s"OPTIMIZE $view")
    // ordinary SQL on the registered view parses through the delegate
    assert(s.sql(s"SELECT COUNT(*) FROM $view WHERE day = 'd1'")
      .head.getLong(0) == 100)
  }
}
