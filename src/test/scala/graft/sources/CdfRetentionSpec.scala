package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Change-feed retention: `_cdf/v*` grows one dir per CDF-enabled
  * commit and nothing referenced it for reclamation — unbounded growth
  * for a CDC sink. Feed retention is now COUPLED to version retention:
  * [[SnapshotLog.expireVersions]] deletes the expired versions' feed
  * dirs with their manifests, and [[SnapshotLog.vacuum]] sweeps
  * orphaned feed dirs (expired elsewhere, raced writers, crashed
  * `.tmp-*` staging) once aged past retention — never a live
  * version's feed. */
class CdfRetentionSpec extends SparkSpec {

  private def mk(): (String, Path, org.apache.hadoop.fs.FileSystem) = {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_cdfret").toString + "/tbl"
    val mkBatch = (b: Long) =>
      (1L to 20L).map(i => (i + b * 100, i * 1.0, s"d${i % 2}"))
        .toDF("id", "value", "day")
    (1L to 4L).foreach { b =>
      SnapshotLog.upsertBatch(spark, base, mkBatch(b), Seq("id"), "id", "day",
        batchId = b, maxRetries = 5, statsCols = Nil,
        clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = true)
    }
    val bp = new Path(base)
    (base, bp, bp.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  test("expireVersions deletes the expired versions' feed dirs with their manifests") {
    val (base, bp, fs) = mk()
    val cdf = new Path(bp, "_cdf")
    assert(fs.listStatus(cdf).count(_.getPath.getName.startsWith("v")) == 4)

    val expired = SnapshotLog.expireVersions(spark, base, keepLast = 2)
    assert(expired == Seq(1L, 2L))
    val left = fs.listStatus(cdf).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.drop(1).toLong).sorted.toSeq
    assert(left == Seq(3L, 4L),
      s"expired versions' feeds must go with their manifests, left: $left")
    // the surviving feed still reads
    assert(SnapshotLog.readCdf(spark, base).get
      .filter(col("_commit_version") === 4L).count() == 20)
  }

  test("vacuum sweeps orphaned and crashed feed dirs past retention, keeps live ones") {
    val (base, bp, fs) = mk()
    val cdf = new Path(bp, "_cdf")
    // fake an orphan (version that never committed) and a crashed tmp
    fs.mkdirs(new Path(cdf, "v00000000099"))
    val orphanFile = new Path(cdf, "v00000000099/part-0.parquet")
    fs.create(orphanFile, true).close()
    fs.mkdirs(new Path(cdf, ".tmp-dead"))
    fs.create(new Path(cdf, ".tmp-dead/part-0.parquet"), true).close()

    // young orphans survive (retention guards in-flight publishes)
    SnapshotLog.vacuum(spark, base, retentionMs = 3600L * 1000)
    assert(fs.exists(orphanFile))

    // aged orphans reclaim; live versions' feeds survive
    SnapshotLog.vacuum(spark, base, retentionMs = 0L)
    assert(!fs.exists(new Path(cdf, "v00000000099")))
    assert(!fs.exists(new Path(cdf, ".tmp-dead")))
    (1L to 4L).foreach { v =>
      assert(fs.exists(new Path(cdf, f"v$v%011d")),
        s"live version $v's feed must never be vacuumed")
    }
  }
}
