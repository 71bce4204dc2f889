package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The symlink-manifest interop export: an engine that only speaks the
  * Hive symlink contract must see exactly the committed snapshot — and
  * snapshots a file list cannot represent (deletion vectors) must
  * refuse rather than resurrect. */
class SymlinkManifestSpec extends SparkSpec {
  import spark.implicits._

  test("symlink-manifest export: external readers see the exact snapshot; DVs refuse") {
    val base = Files.createTempDirectory("graft_symlink").toString + "/t"
    val rows = (1L to 90L).map(i => (i, i * 1.0, s"d${i % 3}")).toDF("id", "value", "day")
    SnapshotLog.upsertBatch(spark, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Seq("id"), clusterBy = Nil,
      clusterFiles = 4, opCol = None, writeCdf = false)
    assert(SnapshotLog.generateSymlinkManifest(spark, base) == 3L)
    // a symlink reader: concat the manifests' lines, read those files
    val fsys = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listed = fsys.listStatus(new Path(base, "_symlink_format_manifest"))
      .filter(_.isDirectory).flatMap { d =>
        val in = fsys.open(new Path(d.getPath, "manifest"))
        try new String(in.readAllBytes()).split("\n").filter(_.nonEmpty)
        finally in.close()
      }
    val external = spark.read.parquet(listed.toIndexedSeq: _*)
    val snapshot = SnapshotLog.read(spark, base).get
    assert(external.count() == 90)
    assert(external.select("id", "value", "day")
      .exceptAll(snapshot.select("id", "value", "day")).isEmpty)

    // DV-carrying snapshots refuse (a symlink reader would resurrect)
    SnapshotLog.deleteWhere(spark, base, col("id") === 1L, "day",
      deletionVectors = true)
    val e = intercept[RuntimeException] {
      SnapshotLog.generateSymlinkManifest(spark, base)
    }
    assert(e.getMessage.contains("deletion vectors"))
    // OPTIMIZE materializes the deletes; export works again
    assert(SnapshotLog.optimizeTable(spark, base, "day", minFiles = 1,
      statsCols = Seq("id")) > 0)
    assert(SnapshotLog.generateSymlinkManifest(spark, base) == 3L)

    // the SQL surface: GENERATE routes through the maintenance parser
    val s = graft.GraftSessions.withExtensions(spark)
    Catalog.registerSnapshotLog(s, "symlink", "t", base, Some("day"))
    val row = s.sql("GENERATE symlink_format_manifest FOR TABLE symlink_t")
      .collect().head
    assert(row.getString(0).startsWith("GENERATE") && row.getLong(1) == 3L)

    // DESCRIBE DETAIL: one-row manifest summary tracks the lifecycle
    val det = s.sql("DESCRIBE DETAIL symlink_t").collect().head
    assert(det.getString(0) == "graft-snapshot" && det.getString(1) == base)
    assert(det.getLong(3) == 3L, "num_partitions")
    assert(det.getLong(6) == 89L, "live rows after the delete+optimize")
    assert(det.getLong(7) == 0L, "DVs were materialized by OPTIMIZE")
  }

}
