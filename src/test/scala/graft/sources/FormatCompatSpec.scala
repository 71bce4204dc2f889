package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Backward compatibility with the PRE-round-8 manifest grammar:
  * `partition\tfile[\tstats[\tblooms]]` lines, no `#schema`/`#op`
  * headers, no `__bytes` entries, no DV field. A table whose log was
  * written by the old code must (a) read correctly through every new
  * path (footer-scan fallbacks), (b) answer metadata counts, and
  * (c) upgrade to O(manifest) planning through one `computeStats`
  * pass — the documented ANALYZE recovery, proven here by planning
  * with the data dir renamed away AFTER the upgrade. */
class FormatCompatSpec extends SparkSpec {
  import spark.implicits._

  test("legacy manifests read, count, and upgrade via computeStats") {
    val base = Files.createTempDirectory("graft_legacy").toString + "/tbl"
    val bp = new Path(base)
    val hfs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // lay out data files the way the old writer did, then hand-write
    // an OLD-grammar manifest over them (stats with __rows only)
    val rows = (1L to 120L).map(i => (i, i * 2.0, s"p${i % 2}"))
      .toDF("id", "value", "part")
    rows.withColumn("__p", col("part"))
      .repartition(2)
      .write.partitionBy("__p").parquet(s"$base/data/b1v1-legacy")
    val staged = hfs.listStatus(new Path(bp, "data/b1v1-legacy"))
      .filter(_.getPath.getName.startsWith("__p=")).flatMap { d =>
        val p = d.getPath.getName.stripPrefix("__p=")
        hfs.listStatus(d.getPath).filter(_.getPath.getName.endsWith(".parquet"))
          .map(st => p -> s"data/b1v1-legacy/${d.getPath.getName}/${st.getPath.getName}")
      }.toSeq
    assert(staged.size >= 2)
    val text = staged.sortBy(_._2).map { case (p, f) =>
      s"$p\t$f" // bare old-style line: no stats at all
    }.mkString("", "\n", "\n") + "#eof\n"
    hfs.mkdirs(new Path(bp, "_log"))
    val out = hfs.create(new Path(bp, "_log/v00000000001.txt"), false)
    out.write(text.getBytes(StandardCharsets.UTF_8)); out.close()

    // old manifest parses as a legacy one
    val m1 = SnapshotLog.readManifest(hfs, bp).get
    assert(m1.schemaJson.isEmpty && m1.dvs.isEmpty && m1.op.isEmpty)
    assert(SnapshotLog.countRows(m1).isEmpty, "no counts without stats")

    // every read path still answers exactly (footer fallbacks)
    assert(SnapshotLog.read(spark, base).get.count() == 120)
    assert(SnapshotLog.read(spark, base).get
      .agg(sum(col("id"))).head.getLong(0) == (1L to 120L).sum)
    assert(SnapshotLog.readPartitions(spark, base, Seq("p1")).get.count() == 60)

    // one ANALYZE upgrades: schema header + byte lengths + row counts
    val v2 = SnapshotLog.computeStats(spark, base, Seq("id"))
    assert(v2 == 2L)
    val m2 = SnapshotLog.readManifest(hfs, bp).get
    assert(m2.schemaJson.nonEmpty, "ANALYZE must backfill the schema header")
    assert(m2.allFiles.forall(f => m2.stats.get(f).exists(s =>
      s.contains(SnapshotLog.ByteSizeKey) && s.contains(SnapshotLog.RowCountKey))))
    assert(SnapshotLog.countRows(m2).contains(120L))

    // and planning is now O(manifest): data dir hidden, plan builds
    val dataDir = new Path(bp, "data")
    val hidden = new Path(bp, "data_hidden")
    assert(hfs.rename(dataDir, hidden))
    try {
      val (df, idx) = SnapshotRelation.applyWithIndex(spark, base).get
      // __p was dir-only (partitionBy strips it from the files)
      assert(df.schema.fieldNames.toSet == Set("id", "value", "part"))
      assert(idx.sizeInBytes > 0)
    } finally assert(hfs.rename(hidden, dataDir))

    // new-writer DML composes on top of the upgraded legacy table
    SnapshotLog.deleteWhere(spark, base, col("id") <= 20, "part",
      deletionVectors = true)
    assert(SnapshotLog.read(spark, base).get.count() == 100)
    val m3 = SnapshotLog.readManifest(hfs, bp).get
    assert(m3.files == m2.files && m3.dvs.nonEmpty)
    assert(SnapshotLog.countRows(m3).contains(100L))
  }
}
