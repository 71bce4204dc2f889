package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}

/** `graft.optimize.targetFileSize`: OPTIMIZE splits each rewritten
  * partition into ~ceil(bytes/target) files instead of folding to one
  * — the knob that keeps compaction from destroying scan parallelism
  * on huge partitions. Sizing comes from the manifest's `__bytes`
  * rollups (no extra scan); content is row-preserving either way. */
class OptimizeTargetSizeSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  test("byte target splits the fold; absent target keeps the one-file fold") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_opt_target").toString + "/tbl"
    // several upserts fragment one partition
    (1L to 4L).foreach { b =>
      val rows = (1L to 500L)
        .map(i => (b * 10000 + i, s"payload_${b}_$i" * 8, "d0"))
        .toDF("id", "text", "day")
      SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
        batchId = b, maxRetries = 5, statsCols = Nil,
        clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    }
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val m0 = SnapshotLog.readManifest(fs, bp).get
    assert(m0.files("d0").size >= 2, "fixture must be fragmented")
    val totalRows = 4 * 500
    val bytes = m0.files("d0").flatMap(f =>
      m0.stats(f).get(SnapshotLog.ByteSizeKey).flatMap(_._1.toLongOption)).sum

    // no target: the historical one-file fold
    SnapshotLog.optimizeTable(s, base, "day")
    val m1 = SnapshotLog.readManifest(fs, bp).get
    assert(m1.files("d0").size == 1)
    assert(SnapshotLog.read(s, base).get.count() == totalRows)

    // fragment again, then optimize under a quarter-of-total target
    val more = (1L to 500L).map(i => (50000 + i, s"x$i" * 8, "d0"))
      .toDF("id", "text", "day")
    SnapshotLog.upsertBatch(s, base, more, Seq("id"), "id", "day",
      batchId = 9, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    val view = Catalog.registerSnapshotLog(s, "optt", "t1", base, Some("day"))
    s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
      s"('${SnapshotLog.OptimizeTargetProp}' = '${math.max(bytes / 4, 1)}')")
    SnapshotLog.optimizeTable(s, base, "day")
    val m2 = SnapshotLog.readManifest(fs, bp).get
    val n = m2.files("d0").size
    assert(n >= 2 && n <= 8,
      s"a quarter-of-total target must split the fold (got $n files)")
    // row-preserving, and every output file got fresh byte rollups
    assert(SnapshotLog.read(s, base).get.count() == totalRows + 500)
    assert(m2.files("d0").forall(f =>
      m2.stats.get(f).exists(_.contains(SnapshotLog.ByteSizeKey))))
  }
}
