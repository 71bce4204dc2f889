package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two metadata-plane scale contracts of the commit path:
  *
  *  1. '''Distributed commit stats''' — a commit staging ≥ the
  *     distribution threshold of files collects its per-file row
  *     counts in a DISTRIBUTED job, not one sequential driver footer
  *     RPC per file (a 10⁴-file OPTIMIZE on an object store must not
  *     pay 10⁴ round trips of commit latency). Counts must stay
  *     byte-identical either way: the metadata COUNT(*) fold is
  *     downstream.
  *  2. '''O(1) latest-version resolution''' — the `_log/_latest` hint
  *     (Delta's `_last_checkpoint` shape) lets `currentVersion` skip
  *     the full `_log` listing; the hint is validated against the
  *     atomic roots and NEVER trusted blindly: stale, corrupt, or
  *     missing hints degrade to the listing, never to a wrong
  *     version. */
class CommitScaleSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(base: String) = {
    val bp = new Path(base)
    (bp.getFileSystem(spark.sparkContext.hadoopConfiguration), bp)
  }

  test("a many-file commit does ZERO driver footer reads; counts identical") {
    val base = Files.createTempDirectory("graft_cstat").toString + "/t"
    // 40 partitions → 40 staged files, past the distribution threshold
    val df = (0 until 4000).map(i => (i.toLong, (i % 40).toString))
      .toDF("id", "p").repartition(8)
    val before = SnapshotLog.driverFooterReads.get()
    SnapshotLog.appendBatch(spark, base, df, "p", batchId = 1)
    assert(SnapshotLog.driverFooterReads.get() == before,
      "row counts must come out of the distributed sweep, not driver RPCs")
    val (fs, bp) = fsOf(base)
    val m = SnapshotLog.readManifest(fs, bp).get
    assert(m.allFiles.size >= 16, s"premise: ${m.allFiles.size} staged files")
    // every file carries its exact count; the metadata fold agrees
    assert(SnapshotLog.countRows(m).contains(4000L))
    val perPart = SnapshotLog.partitionCounts(m).get
    assert(perPart.values.sum == 4000L && perPart.size == 40)

    // a SMALL commit stays on the driver path (job launch overhead
    // beats a handful of local reads) and still records counts
    val before2 = SnapshotLog.driverFooterReads.get()
    SnapshotLog.appendBatch(spark, base,
      Seq((90000L, "0")).toDF("id", "p"), "p", batchId = 2)
    assert(SnapshotLog.driverFooterReads.get() > before2,
      "sub-threshold commits use the cheap sequential path")
    val m2 = SnapshotLog.readManifest(fs, bp).get
    assert(SnapshotLog.countRows(m2).contains(4001L))
  }

  test("_latest hint: O(1) resolution, never trusted blindly") {
    val base = Files.createTempDirectory("graft_chint").toString + "/t"
    val (fs, bp) = fsOf(base)
    (1 to 12).foreach { i =>
      SnapshotLog.appendBatch(spark, base,
        Seq((i.toLong, "a")).toDF("id", "p"), "p", batchId = i.toLong)
    }
    val hintPath = new Path(base, "_log/_latest")
    assert(fs.exists(hintPath), "every commit rewrites the hint")

    // happy path: resolution consults the hint, not the listing
    val listings0 = SnapshotLog.fullLogListings.get()
    assert(SnapshotLog.currentVersion(fs, bp) == 12L)
    assert(SnapshotLog.readManifest(fs, bp).get.version == 12L)
    assert(SnapshotLog.fullLogListings.get() == listings0,
      "a valid hint must skip the full _log listing")

    // STALE hint (older commit's value): forward probing still finds
    // the true latest — claims are dense
    val out = fs.create(hintPath, true)
    out.write("9".getBytes("UTF-8")); out.close()
    assert(SnapshotLog.currentVersion(fs, bp) == 12L,
      "stale hint + forward probes = true latest")

    // CORRUPT hint: garbage text degrades to the listing, same answer
    val out2 = fs.create(hintPath, true)
    out2.write("not-a-number".getBytes("UTF-8")); out2.close()
    assert(SnapshotLog.currentVersion(fs, bp) == 12L)

    // FABRICATED hint (points past the true latest): the hinted
    // version has no atomic root → fall back, never invent versions
    val out3 = fs.create(hintPath, true)
    out3.write("4000".getBytes("UTF-8")); out3.close()
    assert(SnapshotLog.currentVersion(fs, bp) == 12L)

    // MISSING hint: plain listing fallback
    fs.delete(hintPath, false)
    assert(SnapshotLog.currentVersion(fs, bp) == 12L)

    // the next commit restores the hint and the O(1) path
    SnapshotLog.appendBatch(spark, base,
      Seq((99L, "a")).toDF("id", "p"), "p", batchId = 99L)
    assert(fs.exists(hintPath))
    val listings1 = SnapshotLog.fullLogListings.get()
    assert(SnapshotLog.currentVersion(fs, bp) == 13L)
    assert(SnapshotLog.fullLogListings.get() == listings1)

    // a corrupt hint never corrupts ANSWERS: reads stay exact
    assert(SnapshotLog.read(spark, base).get.count() == 13L)
  }

  test("hint survives concurrent commits (worst case: stale, repaired by probe)") {
    val base = Files.createTempDirectory("graft_chintc").toString + "/t"
    SnapshotLog.appendBatch(spark, base,
      Seq((0L, "a")).toDF("id", "p"), "p", batchId = 0L)
    val (fs, bp) = fsOf(base)
    // 4 threads × 5 appends racing: after the dust settles the hint +
    // probe must resolve the true latest and count every batch
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val threads = (1 to 4).map { t =>
      new Thread(() => {
        try {
          (1 to 5).foreach { i =>
            SnapshotLog.appendBatch(spark, base,
              Seq((t * 100L + i, "a")).toDF("id", "p"), "p",
              batchId = t * 100L + i, maxRetries = 200)
          }
        } catch { case e: Throwable => failed.compareAndSet(null, e); () }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failed.get == null, s"a racing writer died: ${failed.get}")
    val v = SnapshotLog.currentVersion(fs, bp)
    def logNames = fs.listStatus(new Path(base, "_log"))
      .map(_.getPath.getName).filter(_.startsWith("v")).sorted.toSeq
    assert(v == 21L,
      s"1 + 20 racing commits, dense claims, got $v; log=${logNames.mkString(",")}")
    assert(SnapshotLog.read(spark, base).get.count() == 21L)
  }
}
