package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** REPLACE WHERE — the atomic idempotent-backfill primitive: one
  * commit deletes the predicate's region and inserts the batch. */
class ReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def mk(prefix: String): (String, Path) = {
    val base = Files.createTempDirectory(prefix).toString + "/t"
    val rows = (1L to 90L).map(i => (i, 1.0, s"d${i % 3}")).toDF("id", "value", "day")
    SnapshotLog.upsertBatch(spark, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Seq("id"), clusterBy = Nil,
      clusterFiles = 4, opCol = None, writeCdf = false)
    (base, new Path(base))
  }

  test("replaces exactly the predicate's region, atomically, idempotently") {
    val (base, bp) = mk("graft_rw")
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v0 = SnapshotLog.readManifest(fs, bp).get.version
    val batch = (1001L to 1010L).map(i => (i, 9.0, "d1")).toDF("id", "value", "day")
    val out = SnapshotLog.replaceWhere(spark, base, batch,
      col("day") === "d1", "day", statsCols = Seq("id")).get
    assert(out.version == v0 + 1, "one commit")
    val m = SnapshotLog.readManifest(fs, bp).get
    assert(m.op.contains("REPLACE_WHERE"))
    val t = SnapshotLog.read(spark, base).get
    assert(t.count() == 70, "60 survivors + 10 inserted")
    assert(t.filter(col("day") === "d1").count() == 10)
    assert(t.filter(col("day") === "d1" && col("value") =!= 9.0).count() == 0)
    assert(t.filter(col("day") =!= "d1").count() == 60, "other regions untouched")

    // idempotent backfill: re-landing the same slice replaces it again
    SnapshotLog.replaceWhere(spark, base, batch, col("day") === "d1", "day")
    val t2 = SnapshotLog.read(spark, base).get
    assert(t2.count() == 70, "re-run must not duplicate the slice")
  }

  test("rejects batch rows outside the predicate (Delta's constraint)") {
    val (base, _) = mk("graft_rw2")
    val bad = Seq((2001L, 9.0, "d0")).toDF("id", "value", "day")
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.replaceWhere(spark, base, bad, col("day") === "d1", "day")
    }
    assert(e.getMessage.contains("REPLACE WHERE"))
  }

  test("row predicates work; CDF emits deletes + inserts in one feed version") {
    val (base, bp) = mk("graft_rw3")
    // the batch must itself satisfy the predicate: odd ids, value < 2
    val batch = Seq(3001L, 3003L, 3005L, 3007L, 3009L)
      .map(i => (i, 1.5, s"d${i % 3}")).toDF("id", "value", "day")
    val out = SnapshotLog.replaceWhere(spark, base, batch,
      col("value") < 2.0 && col("id") % 2 === 1, "day", writeCdf = true).get
    val t = SnapshotLog.read(spark, base).get
    assert(t.count() == 90 - 45 + 5)
    val feed = SnapshotLog.readCdf(spark, base).get
      .filter(col("_commit_version") === out.version)
    assert(feed.filter(col("change_type") === "delete").count() == 45)
    assert(feed.filter(col("change_type") === "insert").count() == 5)
  }

  test("SQL surface: INSERT INTO view REPLACE WHERE pred SELECT ...") {
    val (base, _) = mk("graft_rw5")
    val s = graft.GraftSessions.withExtensions(spark)
    val view = Catalog.registerSnapshotLog(s, "rw", "t", base, Some("day"))
    // register on the EXTENSIONS session — temp views are session-scoped
    s.createDataFrame((5001L to 5004L).map(i => (i, 8.0, "d2")))
      .toDF("id", "value", "day")
      .createOrReplaceTempView("rw_src")
    val r = s.sql(
      s"INSERT INTO $view REPLACE WHERE day = 'd2' SELECT * FROM rw_src")
      .collect().head
    assert(r.getString(0) == "REPLACE WHERE")
    // the same view name immediately reads the new snapshot
    assert(s.sql(s"SELECT COUNT(*) FROM $view WHERE day = 'd2'")
      .head.getLong(0) == 4)
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 64)
    // constraint violations surface through SQL too
    intercept[Exception] {
      s.sql(s"INSERT INTO $view REPLACE WHERE day = 'd0' SELECT * FROM rw_src")
    }
  }

  test("row-tracked survivors keep their ids through the replace") {
    val (base, _) = mk("graft_rw4")
    SnapshotLog.setProperties(spark, base,
      Map(SnapshotLog.RowTrackingProp -> "true"))
    def ids() = SnapshotRelation.read(spark, base, None, Some("day")).get
      .select(col("id"), col(SnapshotLog.RowIdCol))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = ids()
    val batch = (4001L to 4003L).map(i => (i, 9.0, "d1")).toDF("id", "value", "day")
    SnapshotLog.replaceWhere(spark, base, batch, col("day") === "d1", "day")
    val after = ids()
    assert(after.size == 63 && after.values.toSet.size == 63)
    val survivors = before.keys.filter(_ % 3 != 1)
    assert(survivors.forall(k => after(k) == before(k)),
      "rows outside the replaced region must keep their ids")
    assert((4001L to 4003L).forall(k => after(k) >= 90L),
      "inserted rows allocate fresh ids")
  }
}
