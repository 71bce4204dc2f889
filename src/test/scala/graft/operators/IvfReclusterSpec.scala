package graft.operators

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.SnapshotLog

/** [[IvfMaintenance]] — the persisted-IVF drift repair. Appending
  * vectors from a SHIFTED distribution against frozen centroids skews
  * cell balance; RECLUSTER must restore it by rewriting only touched
  * cells, keep the corpus byte-complete, and not regress recall. */
class IvfReclusterSpec extends SparkSpec {
  private lazy val s = graft.GraftSessions.withExtensions(spark)
  import s.implicits._

  /** `n` deterministic 4-d vectors around `centers`, ids from `idBase`. */
  private def blob(idBase: Long, n: Int,
      centers: Seq[Seq[Double]]): DataFrame =
    (0 until n).map { i =>
      val c = centers(i % centers.size)
      val j = (i * 2654435761L % 1000) / 1000.0 - 0.5 // deterministic jitter
      (idBase + i, c.zipWithIndex.map { case (x, d) => x + j * (d + 1) * 0.1 })
    }.toDF("vec_id", "v")

  private val homeCenters = Seq(
    Seq(0.0, 0.0, 0.0, 0.0), Seq(10.0, 0.0, 0.0, 0.0),
    Seq(0.0, 10.0, 0.0, 0.0), Seq(0.0, 0.0, 10.0, 0.0))
  // the drift: appended mass lives somewhere the seeds never saw
  private val driftCenters = Seq(
    Seq(25.0, 25.0, 0.0, 0.0), Seq(-20.0, 5.0, 15.0, 0.0))

  private def manifest(base: String): SnapshotLog.Manifest = {
    val bp = new Path(base)
    SnapshotLog.readManifest(
      bp.getFileSystem(s.sparkContext.hadoopConfiguration), bp).get
  }

  test("drift -> recluster: touched-cell rewrite, corpus intact, recall repaired") {
    val base = Files.createTempDirectory("graft_ivfm").toString + "/ivf"
    IvfMaintenance.build(s, base, blob(0L, 80, homeCenters),
      k = 4, iters = 2)
    assert(manifest(base).props.get(SnapshotLog.PartColProp).contains("cid"))

    // 3 appends of drifted mass against the FROZEN centroids
    (1 to 3).foreach(i => IvfMaintenance.append(s, base,
      blob(1000L * i, 80, driftCenters)))
    val total = 80 + 3 * 80
    assert(SnapshotLog.read(s, base).get.count() == total)

    val queries = blob(50000L, 8, driftCenters)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val recallBefore = IvfMaintenance.recallAtK(s, base, queries,
      nprobe = 1, k = 10)

    // the drifted corpus skews occupancy: the frozen quantizer dumps
    // all drift mass into few cells
    val occBefore = SnapshotLog.read(s, base).get
      .groupBy("cid").count().collect().map(_.getLong(1))
    assert(occBefore.max >= total / 3,
      s"premise: drift skews a frozen cell well past the balanced " +
        s"${total / 4} (max=${occBefore.max})")

    val mBefore = manifest(base)
    val (moved, touchedCells) = IvfMaintenance.recluster(s, base, iters = 2)
    assert(moved > 0L && touchedCells > 0L)
    val mAfter = manifest(base)
    // cells outside the touched set keep their EXACT file lists (the
    // replaceWhere contract — when the drift left any cell alone)
    val kept = mBefore.files.keySet.filter(p =>
      mAfter.files.get(p).contains(mBefore.files(p)))
    assert(touchedCells == 4L || kept.nonEmpty,
      s"only touched cells rewrite (touched=$touchedCells, kept=${kept.size})")
    assert(SnapshotLog.read(s, base).get.count() == total,
      "recluster moves rows, never loses or doubles them")
    assert(SnapshotLog.read(s, base).get
      .select("vec_id").distinct().count() == total)

    val recallAfter = IvfMaintenance.recallAtK(s, base, queries,
      nprobe = 1, k = 10)
    assert(recallAfter >= recallBefore,
      s"recluster must not regress recall ($recallBefore -> $recallAfter)")
    // the drift premise: frozen-centroid recall at nprobe=1 was hurt;
    // post-recluster the drift mass has own cells
    assert(recallAfter >= 0.9,
      s"post-recluster nprobe=1 recall@10 should be near-exact on " +
        s"well-separated blobs, got $recallAfter")

    // vs a FRESH build of the same corpus: recluster lands within
    // reach of from-scratch quality
    val fresh = Files.createTempDirectory("graft_ivff").toString + "/ivf"
    val corpus = SnapshotLog.read(s, base).get
      .select(col("vec_id"), col("v"))
    IvfMaintenance.build(s, fresh, corpus, k = 4, iters = 2)
    val recallFresh = IvfMaintenance.recallAtK(s, fresh, queries,
      nprobe = 1, k = 10)
    assert(recallAfter >= recallFresh - 0.1,
      s"recluster ($recallAfter) within 0.1 of fresh build ($recallFresh)")

    // converged: an immediate second recluster is a no-op commit-wise
    val vAfter = manifest(base).version
    val (moved2, _) = IvfMaintenance.recluster(s, base, iters = 1)
    if (moved2 == 0L)
      assert(manifest(base).version == vAfter, "no-op commits nothing")
  }

  test("a recluster crash between the two commits is detected and repaired") {
    val base = Files.createTempDirectory("graft_ivfc").toString + "/ivf"
    IvfMaintenance.build(s, base, blob(0L, 80, homeCenters), k = 4, iters = 2)
    (1 to 2).foreach(i => IvfMaintenance.append(s, base,
      blob(1000L * i, 80, driftCenters)))
    val centPath = IvfMaintenance.centroidsPath(base)
    val centOld = SnapshotLog.read(s, centPath).get.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
    assert(!IvfMaintenance.halfApplied(s, base))

    // a full recluster, then reproduce its crash window exactly: the
    // index rewrite landed, the centroid commit did NOT — roll the
    // centroid table back to the pre-recluster set (no token) and
    // leave the pending stamp dangling
    val (moved, _) = IvfMaintenance.recluster(s, base, iters = 2)
    assert(moved > 0L)
    SnapshotLog.appendBatch(s, centPath, centOld.toDF("cid", "cv"),
      SnapshotLog.NoPartCol, batchId = 99L, overwrite = true,
      resetColumnState = true)
    SnapshotLog.unsetProperties(s, centPath, Seq(IvfMaintenance.TokenProp))
    SnapshotLog.setProperties(s, base,
      Map(IvfMaintenance.PendingProp -> "crash-token"))
    assert(IvfMaintenance.halfApplied(s, base),
      "the mixed window must be detectable")
    // the mixed pair still answers (degraded recall, never wrong rows)
    val queries = blob(50000L, 8, driftCenters)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val recallMixed = IvfMaintenance.recallAtK(s, base, queries,
      nprobe = 1, k = 10)

    // repair: centroids re-derived as each cell's exact member mean —
    // consistent with the stored assignment by construction
    assert(IvfMaintenance.repairIfPending(s, base))
    assert(!IvfMaintenance.halfApplied(s, base))
    assert(manifest(base).props.get(IvfMaintenance.PendingProp).isEmpty)
    assert(manifest(centPath).props
      .get(IvfMaintenance.TokenProp).contains("crash-token"))
    val recallRepaired = IvfMaintenance.recallAtK(s, base, queries,
      nprobe = 1, k = 10)
    assert(recallRepaired >= recallMixed,
      s"repair must not regress recall ($recallMixed -> $recallRepaired)")
    assert(recallRepaired >= 0.85,
      s"repaired pair should probe near the reclustered quality, " +
        s"got $recallRepaired")
    // repair is idempotent / no-op when nothing dangles
    assert(!IvfMaintenance.repairIfPending(s, base))
  }
}
