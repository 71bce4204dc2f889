package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Delta-style TABLE FEATURES: the manifest's `#feature` header is the
  * protocol gate (round-12 verdict item 3). A reader that lacks a
  * required reader feature must REFUSE the table (not resurrect DV'd
  * rows / expose physical names); a writer that lacks a required
  * writer feature must refuse to COMMIT (not corrupt invariants it
  * cannot see). "Old engine" is simulated by hand-committing a
  * manifest requiring a feature that does not exist. */
class ProtocolFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def fsFor(base: String) =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def seed(base: String): Unit =
    SnapshotLog.appendBatch(spark, base,
      (1L to 30L).map(i => (i, i * 1.0, s"d${i % 3}")).toDF("id", "value", "day"),
      "day", batchId = 1,
      propsAdd = Map(SnapshotLog.PartColProp -> "day"))

  /** Commit a new version whose root is the current one plus extra
    * header lines — the hand-crafted "future engine wrote this" table. */
  private def commitWithHeader(base: String, extra: String): Long = {
    val fs = fsFor(base)
    val bp = new Path(base)
    val v = SnapshotLog.readManifest(fs, bp).get.version
    val cur = new Path(new Path(bp, "_log"), f"v$v%011d.txt")
    val in = fs.open(cur)
    val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    val out = fs.create(new Path(new Path(bp, "_log"), f"v${v + 1}%011d.txt"), false)
    try out.write((extra + "\n" + text).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    v + 1
  }

  test("DV commits stamp the deletionVectors feature; it drops when DVs materialize away") {
    val base = Files.createTempDirectory("graft_feat1").toString + "/t"
    seed(base)
    val fs = fsFor(base)
    val bp = new Path(base)
    assert(SnapshotLog.readManifest(fs, bp).get.readerFeatures.isEmpty,
      "a plain table requires no features")
    SnapshotLog.deleteWhere(spark, base, col("id") === 5L, "day",
      deletionVectors = true)
    val m = SnapshotLog.readManifest(fs, bp).get
    assert(m.readerFeatures == Set("deletionVectors"))
    assert(m.writerFeatures.contains("deletionVectors"))
    // OPTIMIZE materializes the delete: the requirement disappears
    SnapshotLog.optimizeTable(spark, base, "day", minFiles = 1)
    val m2 = SnapshotLog.readManifest(fs, bp).get
    assert(m2.dvs.isEmpty && !m2.readerFeatures.contains("deletionVectors"),
      "features derive from content — a DV-free snapshot requires none")
  }

  test("an unknown READER feature fails the read closed, by name") {
    val base = Files.createTempDirectory("graft_feat2").toString + "/t"
    seed(base)
    commitWithHeader(base, "#feature\ttimeCrystals\treader")
    val err = intercept[SnapshotLog.ProtocolException] {
      SnapshotLog.read(spark, base)
    }
    assert(err.getMessage.contains("timeCrystals"))
    // time travel to the PRE-feature version still works: the gate is
    // per-manifest, not per-table
    assert(SnapshotLog.readVersion(spark, base, 1L).get.count() == 30)
  }

  test("an unknown WRITER feature blocks commits but not reads") {
    val base = Files.createTempDirectory("graft_feat3").toString + "/t"
    seed(base)
    commitWithHeader(base, "#feature\tquantumWrites\twriter")
    // reads are unaffected — the feature constrains writers only
    assert(SnapshotLog.read(spark, base).get.count() == 30)
    // every write path funnels through tryCommit, so every one refuses
    val err = intercept[SnapshotLog.ProtocolException] {
      SnapshotLog.appendBatch(spark, base,
        Seq((99L, 9.9, "d0")).toDF("id", "value", "day"), "day", batchId = 9)
    }
    assert(err.getMessage.contains("quantumWrites"))
    intercept[SnapshotLog.ProtocolException] {
      SnapshotLog.setProperties(spark, base, Map("k" -> "v"))
    }
  }

  test("this engine's own features round-trip through the gate") {
    val base = Files.createTempDirectory("graft_feat4").toString + "/t"
    seed(base)
    SnapshotLog.setProperties(spark, base, Map(
      SnapshotLog.RowTrackingProp -> "true",
      SnapshotLog.CdfProp -> "true"))
    SnapshotLog.addConstraint(spark, base, "pos", "value >= 0")
    val m = SnapshotLog.readManifest(fsFor(base), new Path(base)).get
    assert(m.writerFeatures.contains("rowTracking"))
    assert(m.writerFeatures.contains("changeDataFeed"))
    assert(m.writerFeatures.contains("checkConstraints"))
    // and the engine can still write (it implements what it stamps)
    SnapshotLog.appendBatch(spark, base,
      Seq((99L, 9.9, "d0")).toDF("id", "value", "day"), "day", batchId = 2)
    assert(SnapshotLog.read(spark, base).get.count() == 31)
    // DESCRIBE DETAIL surfaces the requirement (Delta's tableFeatures)
    val s = graft.GraftSessions.withExtensions(spark)
    val view = Catalog.registerSnapshotLog(s, "feat4", "t", base, Some("day"))
    val det = s.sql(s"DESCRIBE DETAIL $view").collect().head
    assert(det.getAs[String]("writer_features").split(",").toSet ==
      Set("changeDataFeed", "checkConstraints", "rowTracking"))
    assert(det.getAs[String]("reader_features") == "")
  }
}
