package graft.plans

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}
import graft.sources.{Catalog, SnapshotLog}

/** `COPY INTO` (idempotent file-level ingestion) and `DESCRIBE DETAIL`
  * through the delegating parser: files load AT MOST ONCE (tracked as
  * `copy:` watermarks in the manifest), re-runs and racing loaders
  * never duplicate rows, and a file rewritten in place stays skipped
  * (the Delta contract). */
class CopyIntoSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  private def mkTable(prefix: String, db: String): (String, Path, String) = {
    import s.implicits._
    val base = Files.createTempDirectory(prefix).toString + "/tbl"
    val rows = (1L to 100L).map(i => (i, i * 1.5, s"d${i % 3}"))
      .toDF("id", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Seq("id"),
      clusterBy = Nil, clusterFiles = 4, opCol = None, writeCdf = false)
    val view = Catalog.registerSnapshotLog(s, db, "t1", base, Some("day"))
    (base, new Path(base), view)
  }
  private def fs(bp: Path) =
    bp.getFileSystem(s.sparkContext.hadoopConfiguration)
  private def landFile(dir: String, name: String, from: Long, to: Long): Unit = {
    import s.implicits._
    val tmp = Files.createTempDirectory("graft_copy_tmp").toString
    (from to to).map(i => (i, i * 1.5, s"d${i % 3}"))
      .toDF("id", "value", "day").coalesce(1).write.mode("overwrite")
      .parquet(tmp)
    val f = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(f.toPath,
      java.nio.file.Paths.get(dir, name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  test("COPY INTO loads each file at most once, re-runs are no-ops") {
    val (base, bp, view) = mkTable("graft_copy1", "copy1")
    val land = Files.createTempDirectory("graft_land1").toString
    landFile(land, "a.parquet", 101, 150)
    landFile(land, "b.parquet", 151, 180)

    val r1 = s.sql(s"COPY INTO $view FROM '$land' FILEFORMAT = PARQUET")
      .collect().head
    assert(r1.getString(0) == "COPY INTO" && r1.getLong(2) == 2L &&
      r1.getLong(3) == 80L, s"expected 2 files / 80 rows, got $r1")
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 180L)

    // exact re-run: nothing new, not even a version commit
    val vBefore = SnapshotLog.readManifest(fs(bp), bp).get.version
    val r2 = s.sql(s"COPY INTO $view FROM '$land' FILEFORMAT = PARQUET")
      .collect().head
    assert(r2.getLong(2) == 0L && r2.getLong(3) == 0L)
    assert(SnapshotLog.readManifest(fs(bp), bp).get.version == vBefore)

    // a file REWRITTEN IN PLACE stays skipped (Delta contract)...
    landFile(land, "a.parquet", 901, 999)
    val r3 = s.sql(s"COPY INTO $view FROM '$land' FILEFORMAT = PARQUET")
      .collect().head
    assert(r3.getLong(2) == 0L, "a rewritten already-loaded file must stay skipped")

    // ...while a genuinely new file loads alone
    landFile(land, "c.parquet", 181, 200)
    val r4 = s.sql(s"COPY INTO $view FROM '$land' FILEFORMAT = PARQUET")
      .collect().head
    assert(r4.getLong(2) == 1L && r4.getLong(3) == 20L)
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 200L)
    // watermarks recorded per file
    assert(SnapshotLog.readManifest(fs(bp), bp).get.txns
      .keys.count(_.startsWith("copy:")) == 3)
  }

  test("PATTERN restricts the listing; hidden/_ files never load") {
    val (base, _, view) = mkTable("graft_copy2", "copy2")
    val land = Files.createTempDirectory("graft_land2").toString
    landFile(land, "x_2024.parquet", 101, 110)
    landFile(land, "x_2025.parquet", 111, 130)
    landFile(land, "y_2025.parquet", 131, 140)
    landFile(land, "_committing.parquet", 500, 600)
    val r = s.sql(s"COPY INTO $view FROM '$land' FILEFORMAT = PARQUET " +
      s"PATTERN = 'x_*.parquet'").collect().head
    assert(r.getLong(2) == 2L && r.getLong(3) == 30L, s"got $r")
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 130L)
  }

  test("racing loaders of the same directory never duplicate rows") {
    val (base, bp, view) = mkTable("graft_copy3", "copy3")
    val land = Files.createTempDirectory("graft_land3").toString
    landFile(land, "a.parquet", 101, 160)
    landFile(land, "b.parquet", 161, 220)
    val sql = s"COPY INTO $view FROM '$land' FILEFORMAT = PARQUET"
    val threads = (1 to 2).map(_ => new Thread(() => { s.sql(sql).collect(); () }))
    threads.foreach(_.start()); threads.foreach(_.join())
    val dup = SnapshotLog.read(s, base).get
      .groupBy("id").count().filter(col("count") > 1).count()
    assert(dup == 0L, "racing COPY INTO must not duplicate any row")
    assert(SnapshotLog.read(s, base).get.count() == 220L)
  }

  test("watermarks past the spill threshold ride a side file; roots stay O(1); exactly-once survives") {
    val (base, bp, view) = mkTable("graft_copy5", "copy5")
    s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
      s"('${SnapshotLog.TxnSpillProp}' = '3')")
    val land = Files.createTempDirectory("graft_land5").toString
    landFile(land, "a.parquet", 101, 120)
    landFile(land, "b.parquet", 121, 140)
    landFile(land, "c.parquet", 141, 160)
    landFile(land, "d.parquet", 161, 180)
    s.sql(s"COPY INTO $view FROM '$land' FILEFORMAT = PARQUET")
    val f = fs(bp)
    val m = SnapshotLog.readManifest(f, bp).get
    assert(m.txns.keys.count(_.startsWith("copy:")) == 4)
    val logDir = new Path(bp, "_log")
    def rootOf(v: Long): String = {
      val in = f.open(new Path(logDir, f"v$v%011d.txt"))
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    def txnFileRel(t: String): String = t.split("\n")
      .find(_.startsWith("#txnfile\t"))
      .getOrElse(fail(s"no #txnfile pointer in root:\n$t")).split("\t")(1)
    // the root carries ONE pointer line, zero inline watermark lines
    val root = rootOf(m.version)
    assert(!root.contains("#txn\t"),
      "past the threshold no inline #txn line may remain in the root")
    val rel0 = txnFileRel(root)
    // exactly-once still enforced THROUGH the spilled set
    val r2 = s.sql(s"COPY INTO $view FROM '$land' FILEFORMAT = PARQUET")
      .collect().head
    assert(r2.getLong(2) == 0L && r2.getLong(3) == 0L,
      s"re-run must no-op against spilled watermarks, got $r2")
    // a commit leaving the set unchanged REUSES the side file verbatim
    s.sql(s"DELETE FROM $view WHERE id = 1")
    val m2 = SnapshotLog.readManifest(f, bp).get
    assert(m2.version > m.version && m2.txns == m.txns)
    assert(txnFileRel(rootOf(m2.version)) == rel0,
      "unchanged watermark set must reuse the previous side file")
    assert(SnapshotLog.read(s, base).get.count() == 179L) // 100 + 80 - 1
    // vacuum reclaims an orphaned aged spill file, keeps the live one
    val orphan = new Path(logDir, "t00000000099-deadbeef.txt")
    val o = f.create(orphan, true)
    o.write("#txn\tx\t1\n#eof\n".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    o.close()
    f.setTimes(orphan, System.currentTimeMillis() - 48L * 3600 * 1000, -1)
    SnapshotLog.vacuum(s, base, retentionMs = 0)
    assert(!f.exists(orphan),
      "orphaned spilled-watermark side file must be reclaimed")
    assert(f.exists(new Path(logDir, rel0)),
      "live spilled-watermark side file must survive vacuum")
    assert(SnapshotLog.readManifest(f, bp).get.txns == m.txns)
  }

  test("spilled watermarks compose with sharded roots") {
    // the two side-file families must coexist in one root: #shard
    // pointers for the file lines AND a #txnfile pointer for the
    // watermarks, each resolved independently on read
    val (base, bp, view) = mkTable("graft_copy6", "copy6")
    val f = fs(bp)
    SnapshotLog.enableSharding(f, bp)
    s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
      s"('${SnapshotLog.TxnSpillProp}' = '2')")
    val land = Files.createTempDirectory("graft_land6").toString
    landFile(land, "a.parquet", 101, 130)
    landFile(land, "b.parquet", 131, 160)
    landFile(land, "c.parquet", 161, 190)
    s.sql(s"COPY INTO $view FROM '$land' FILEFORMAT = PARQUET")
    val m = SnapshotLog.readManifest(f, bp).get
    assert(m.txns.keys.count(_.startsWith("copy:")) == 3)
    val in = f.open(new Path(new Path(bp, "_log"), f"v${m.version}%011d.txt"))
    val root = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    assert(root.contains("#shard\t"), s"sharded root expected:\n$root")
    assert(root.contains("#txnfile\t") && !root.contains("#txn\t"),
      s"spilled watermarks expected in a sharded root:\n$root")
    // both side-file families resolve: full read + exactly-once re-run
    assert(SnapshotLog.read(s, base).get.count() == 190L)
    val r = s.sql(s"COPY INTO $view FROM '$land' FILEFORMAT = PARQUET")
      .collect().head
    assert(r.getLong(2) == 0L, s"re-run must no-op, got $r")
  }

  test("DESCRIBE DETAIL answers from the manifest alone") {
    val (base, bp, view) = mkTable("graft_copy4", "copy4")
    s.sql(s"DELETE FROM $view WHERE id % 10 = 1") // 10 DV-deleted rows
    val r = s.sql(s"DESCRIBE DETAIL $view").collect().head
    assert(r.getString(0) == "graft-snapshot")
    assert(r.getString(1) == base)
    assert(r.getLong(3) == 3L, s"3 partitions, got $r") // d0 d1 d2
    assert(r.getLong(6) == 90L, s"90 live rows from metadata, got $r")
    assert(r.getLong(7) == 10L, s"10 DV-deleted rows, got $r")
    assert(r.getString(8) == "day")
    // zero data IO: rename the data dir away and DESCRIBE DETAIL still answers
    val f = fs(bp)
    val hidden = new Path(bp.getParent, "data_hidden")
    f.rename(new Path(bp, "data"), hidden)
    try {
      val r2 = s.sql(s"DESCRIBE DETAIL $view").collect().head
      assert(r2.getLong(6) == 90L && r2.getLong(4) == r.getLong(4))
    } finally f.rename(hidden, new Path(bp, "data"))
  }

  test("the verbs on unregistered names fall through to Spark's parser") {
    val e = intercept[Exception](s.sql(
      "COPY INTO nosuch FROM '/tmp/x' FILEFORMAT = PARQUET"))
    assert(!e.getMessage.contains("graft"),
      s"must be Spark's own parse error, got: ${e.getMessage}")
    val e2 = intercept[Exception](s.sql("DESCRIBE DETAIL nosuch"))
    assert(e2.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
      e2.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException])
  }
}
