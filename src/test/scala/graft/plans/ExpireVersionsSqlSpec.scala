package graft.plans

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.{GraftSessions, SparkSpec}
import graft.sources.{Catalog, SnapshotLog}

/** `EXPIRE VERSIONS ON v KEEP LAST n` — SQL retention: old manifests
  * (and their coupled feed dirs) go, the retained chain is untouched,
  * and a following VACUUM can reclaim the unpinned data files. */
class ExpireVersionsSqlSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  test("expires all but the newest n versions; retained history and live reads survive") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_expire_sql").toString + "/tbl"
    (1L to 5L).foreach { b =>
      val rows = (1L to 20L).map(i => (i, b * 10.0, s"d${i % 2}"))
        .toDF("id", "value", "day")
      SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
        batchId = b, maxRetries = 5, statsCols = Nil,
        clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    }
    val view = Catalog.registerSnapshotLog(s, "expire", "t1", base, Some("day"))
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(SnapshotLog.committedVersions(fs, bp).size == 5)

    val res = s.sql(s"EXPIRE VERSIONS ON $view KEEP LAST 2").collect().head
    assert(res.getString(0) == "EXPIRE VERSIONS")
    assert(res.getLong(1) == 3L && res.getLong(2) == 3L)
    assert(SnapshotLog.committedVersions(fs, bp) == Seq(4L, 5L))
    // the live read and the retained historical version still answer
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 20)
    assert(SnapshotLog.readVersion(s, base, 4L).get.count() == 20)
    // an expired version is gone by design
    assert(SnapshotLog.readVersion(s, base, 2L).isEmpty)
    // the verb on an unregistered name keeps Spark's own (parse) error
    intercept[Exception](s.sql("EXPIRE VERSIONS ON nope KEEP LAST 1"))
  }
}
