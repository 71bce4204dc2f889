package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sharded manifests: past [[SnapshotLog.ShardFileThreshold]] live
  * files (or an explicit opt-in) the root version file holds one
  * `#shard` pointer line per partition and the per-file lines live in
  * immutable side files under `_log/`. Contracts proven here:
  *
  *  - a commit touching K of P partitions rewrites K shard files (the
  *    untouched partitions' pointers are REUSED byte-for-byte)
  *  - partition-pruned manifest reads and DESCRIBE HISTORY never open
  *    a pruned (resp. any) shard — proven by renaming shards away
  *  - time travel, vacuum, and inline↔sharded interop all hold. */
class ShardedManifestSpec extends SparkSpec {
  import spark.implicits._

  private def fs(bp: Path) =
    bp.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** rows spread over 3 `day` partitions. */
  private def rows(ids: Range) =
    ids.map(i => (i.toLong, s"u${i % 5}", i * 2.0, s"d${i % 3}"))
      .toDF("id", "user", "value", "day")

  private def mkSharded(prefix: String): (String, Path) = {
    val base = Files.createTempDirectory(prefix).toString + "/tbl"
    val bp = new Path(base)
    SnapshotLog.enableSharding(fs(bp), bp)
    SnapshotLog.upsertBatch(spark, base, rows(1 to 300), Seq("id"), "id",
      "day", batchId = 1, maxRetries = 5, statsCols = Seq("id", "value"),
      clusterBy = Nil, clusterFiles = 4, opCol = None, writeCdf = false)
    (base, bp)
  }

  /** (partition, shardRel) pointer pairs of version `v`'s ROOT file,
    * parsed directly from disk — the spec must not trust the reader
    * under test for the on-disk layout it asserts about. */
  private def rootPtrs(bp: Path, v: Long): Seq[(String, String)] = {
    val p = new Path(new Path(bp, "_log"), f"v$v%011d.txt")
    val in = fs(bp).open(p)
    val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
    assert(text.endsWith("#eof\n"))
    text.split("\n").toSeq.filter(_.startsWith("#shard\t")).map { l =>
      val a = l.split("\t")
      (a(1), a(2))
    }
  }

  test("sharded commits read back identically and reuse untouched shards") {
    val (base, bp) = mkSharded("graft_shard")
    val hfs = fs(bp)

    val p1 = rootPtrs(bp, 1)
    assert(p1.size == 3, s"expected 3 partition pointers, got $p1")
    assert(p1.forall { case (_, rel) =>
      hfs.exists(new Path(new Path(bp, "_log"), rel))
    })

    // full read equals the source rows
    val live = SnapshotLog.read(spark, base).get
    assert(live.count() == 300)
    assert(live.agg(sum("id")).head.getLong(0) == (1L to 300L).sum)
    // stats survive the shard round-trip: metadata COUNT(*) works
    val m1 = SnapshotLog.readManifest(hfs, bp).get
    assert(SnapshotLog.countRows(m1).contains(300L))

    // touch ONE partition (all ids ≡ 0 mod 3 → day d0)
    SnapshotLog.upsertBatch(spark, base,
      rows(1 to 300).filter(col("day") === "d0")
        .withColumn("value", col("value") * 10),
      Seq("id"), "id", "day", batchId = 2, maxRetries = 5,
      statsCols = Seq("id", "value"), clusterBy = Nil, clusterFiles = 4,
      opCol = None, writeCdf = false)
    val p2 = rootPtrs(bp, 2).toMap
    val p1m = p1.toMap
    assert(p2("d1") == p1m("d1") && p2("d2") == p1m("d2"),
      "untouched partitions must reuse the previous shard files verbatim")
    assert(p2("d0") != p1m("d0"),
      "the touched partition must get a fresh shard file")

    val after = SnapshotLog.read(spark, base).get
    assert(after.filter(col("day") === "d0").agg(sum("value")).head.getDouble(0)
      == (1 to 300).filter(_ % 3 == 0).map(_ * 20.0).sum)
    assert(after.filter(col("day") =!= "d0").agg(sum("value")).head.getDouble(0)
      == (1 to 300).filter(_ % 3 != 0).map(_ * 2.0).sum)

    // time travel across sharded versions
    assert(SnapshotLog.readVersion(spark, base, 1).get
      .agg(sum("value")).head.getDouble(0) == (1 to 300).map(_ * 2.0).sum)
  }

  test("pruned reads and history never open shards (renamed away)") {
    val (base, bp) = mkSharded("graft_shard_prune")
    val hfs = fs(bp)
    val logDir = new Path(bp, "_log")
    val ptrs = rootPtrs(bp, 1).toMap

    // expected history numbers BEFORE hiding anything
    val h0 = SnapshotLog.history(spark, base).collect()
    assert(h0.length == 1 && h0(0).getLong(6) == 300L)

    // hide d1's and d2's shards: a d0-only manifest read must succeed
    Seq("d1", "d2").foreach { p =>
      hfs.rename(new Path(logDir, ptrs(p)), new Path(logDir, ptrs(p) + ".bak"))
    }
    val pruned = SnapshotLog.readPartitions(spark, base, Seq("d0")).get
    assert(pruned.agg(sum("id")).head.getLong(0) ==
      (1 to 300).filter(_ % 3 == 0).map(_.toLong).sum)

    // ... while a FULL manifest read fails loudly, never silently
    // dropping the hidden partitions
    val e = intercept[RuntimeException](SnapshotLog.read(spark, base))
    assert(e.getMessage.contains("missing shard"))

    // DESCRIBE HISTORY answers from pointer rollups alone — correct
    // with every shard hidden
    hfs.rename(new Path(logDir, ptrs("d0")),
      new Path(logDir, ptrs("d0") + ".bak"))
    val h = SnapshotLog.history(spark, base).collect()
    assert(h.length == 1)
    assert(h(0).getLong(3) == 3L, "n_partitions from pointers")
    assert(h(0).getLong(6) == 300L, "n_rows from pointer rollups")

    // restore for hygiene
    ptrs.values.foreach { rel =>
      hfs.rename(new Path(logDir, rel + ".bak"), new Path(logDir, rel))
    }
    assert(SnapshotLog.read(spark, base).get.count() == 300)
  }

  test("vacuum keeps referenced shards and reclaims orphans") {
    val (base, bp) = mkSharded("graft_shard_vac")
    val hfs = fs(bp)
    val logDir = new Path(bp, "_log")

    // orphan shard: a lost commit race leaves one behind
    val orphan = new Path(logDir, "s00000000009-p0-deadbeef.txt")
    val o = hfs.create(orphan, false)
    o.write("d9\tdata/none.parquet\n#eof\n".getBytes(StandardCharsets.UTF_8))
    o.close()

    SnapshotLog.vacuum(spark, base, retentionMs = 0L)
    assert(!hfs.exists(orphan), "unreferenced shard file must be reclaimed")
    rootPtrs(bp, 1).foreach { case (_, rel) =>
      assert(hfs.exists(new Path(logDir, rel)),
        s"referenced shard $rel must survive vacuum")
    }
    assert(SnapshotLog.read(spark, base).get.count() == 300)

    // vacuum keeps DATA files referenced only via shards (the root has
    // no file lines — references must resolve THROUGH the pointers)
    val dataFiles = {
      val it = hfs.listFiles(new Path(bp, "data"), true)
      var n = 0L
      while (it.hasNext) { if (it.next().isFile) n += 1 }
      n
    }
    assert(dataFiles > 0L)
  }

  test("add-column evolution evolves the ROOT schema; untouched shards reuse") {
    val (base, bp) = mkSharded("graft_shard_evo")
    // v2 adds a column, touching only d0 — the schema header lives in
    // the root, so d1/d2's shard files are byte-identical and reuse
    SnapshotLog.upsertBatch(spark, base,
      rows(1 to 300).filter(col("day") === "d0").withColumn("tag", lit("x")),
      Seq("id"), "id", "day", batchId = 2, maxRetries = 5,
      statsCols = Seq("id", "value"), clusterBy = Nil, clusterFiles = 4,
      opCol = None, writeCdf = false)
    val p1 = rootPtrs(bp, 1).toMap
    val p2 = rootPtrs(bp, 2).toMap
    assert(p2("d1") == p1("d1") && p2("d2") == p1("d2"))
    val live = SnapshotLog.read(spark, base).get
    assert(live.columns.contains("tag"))
    assert(live.filter(col("tag").isNull).count() ==
      (1 to 300).count(_ % 3 != 0))
    assert(live.filter(col("tag") === "x").count() ==
      (1 to 300).count(_ % 3 == 0))
  }

  test("two-level roots: grouped pointers, group reuse, pruned reads, rollups") {
    val base = Files.createTempDirectory("graft_shard2l").toString + "/tbl"
    val bp = new Path(base)
    val hfs = fs(bp)
    val logDir = new Path(bp, "_log")
    SnapshotLog.enableSharding(hfs, bp, grouped = true)
    val df6 = (1 to 300).map(i => (i.toLong, s"u${i % 5}", i * 2.0, s"d${i % 6}"))
      .toDF("id", "user", "value", "day")
    SnapshotLog.upsertBatch(spark, base, df6, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Seq("id"),
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)

    def root(v: Long): String = {
      val in = hfs.open(new Path(logDir, f"v$v%011d.txt"))
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    }
    def groupRels(v: Long): Seq[String] =
      root(v).split("\n").toSeq.filter(_.startsWith("#sgroup\t"))
        .map(_.split("\t")(3))
    val g1 = groupRels(1)
    assert(g1.size == 3, s"6 partitions at group size 2 → 3 groups: $g1")
    assert(!root(1).contains("#shard\t"),
      "a two-level root must hold ONLY group pointers")
    assert(SnapshotLog.read(spark, base).get.agg(sum("id")).head.getLong(0)
      == (1L to 300L).sum)

    // touch ONE partition (d0 = first group) — the other groups AND
    // their shard files are reused verbatim
    SnapshotLog.upsertBatch(spark, base,
      df6.filter(col("day") === "d0").withColumn("value", col("value") * 10),
      Seq("id"), "id", "day", batchId = 2, maxRetries = 5,
      statsCols = Seq("id"), clusterBy = Nil, clusterFiles = 2,
      opCol = None, writeCdf = false)
    val g2 = groupRels(2)
    assert(g2.head != g1.head, "the touched partition's group must rewrite")
    assert(g2.tail == g1.tail, "untouched groups must reuse byte-for-byte")

    // partition-pruned read with an UNRELATED shard hidden; the full
    // read fails loudly on the hidden shard
    val d1Shard = {
      val in = hfs.open(new Path(logDir, g2.head))
      val t = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
      // group 1 holds d0+d1; take d1's shard rel (field 2 of its line)
      t.split("\n").find(_.startsWith("#shard\td1\t")).get.split("\t")(2)
    }
    hfs.rename(new Path(logDir, d1Shard), new Path(logDir, d1Shard + ".bak"))
    val pruned = SnapshotLog.readPartitions(spark, base, Seq("d2")).get
    assert(pruned.agg(sum("id")).head.getLong(0) ==
      (1 to 300).filter(_ % 6 == 2).map(_.toLong).sum)
    intercept[RuntimeException](SnapshotLog.read(spark, base))
    hfs.rename(new Path(logDir, d1Shard + ".bak"), new Path(logDir, d1Shard))

    // history answers from ROOT rollups (no side file opens): hide
    // every side file, including groups
    val sides = hfs.listStatus(logDir).map(_.getPath.getName)
      .filter(n => (n.startsWith("s") || n.startsWith("g")) &&
        n.endsWith(".txt")).toSeq
    sides.foreach(n => hfs.rename(new Path(logDir, n),
      new Path(logDir, n + ".bak")))
    val h = SnapshotLog.history(spark, base).collect()
    assert(h.length == 2 && h.forall(_.getLong(3) == 6L) &&
      h.forall(_.getLong(6) == 300L))
    // SHOW PARTITIONS' fast path needs the GROUPS back (pointer-only
    // reads), but never a shard
    sides.filter(_.startsWith("g")).foreach(n => hfs.rename(
      new Path(logDir, n + ".bak"), new Path(logDir, n)))
    val summary = SnapshotLog.partitionSummary(hfs, bp)
    assert(summary.map(_._1) == (0 to 5).map(i => s"d$i"))
    assert(summary.map(_._3).sum == 300L)
    sides.filterNot(_.startsWith("g")).foreach(n => hfs.rename(
      new Path(logDir, n + ".bak"), new Path(logDir, n)))

    // vacuum: orphan group file reclaimed, referenced ones survive
    val orphan = new Path(logDir, "g00000000009-p0-deadbeef.txt")
    val o = hfs.create(orphan, false)
    o.write("#shard\tdx\tsnope.txt\t1\t1\t0\tabc\n#eof\n"
      .getBytes(StandardCharsets.UTF_8))
    o.close()
    SnapshotLog.vacuum(spark, base, retentionMs = 0L)
    assert(!hfs.exists(orphan))
    groupRels(2).foreach(rel =>
      assert(hfs.exists(new Path(logDir, rel)), s"live group $rel swept"))
    assert(SnapshotLog.read(spark, base).get.count() == 300)
  }

  test("a table crossing into sharding keeps its inline history readable") {
    val base = Files.createTempDirectory("graft_shard_mig").toString + "/tbl"
    val bp = new Path(base)
    // v1: plain inline manifest (no marker, below threshold)
    SnapshotLog.upsertBatch(spark, base, rows(1 to 90), Seq("id"), "id",
      "day", batchId = 1, maxRetries = 5, statsCols = Seq("id"),
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    assert(rootPtrs(bp, 1).isEmpty, "v1 must be an inline manifest")

    // opt in mid-life: v2 commits sharded
    SnapshotLog.enableSharding(fs(bp), bp)
    SnapshotLog.upsertBatch(spark, base,
      rows(91 to 120), Seq("id"), "id", "day", batchId = 2, maxRetries = 5,
      statsCols = Seq("id"), clusterBy = Nil, clusterFiles = 2,
      opCol = None, writeCdf = false)
    assert(rootPtrs(bp, 2).nonEmpty, "v2 must be sharded")

    // both vintages read, both appear in history, time travel spans them
    assert(SnapshotLog.read(spark, base).get.count() == 120)
    assert(SnapshotLog.readVersion(spark, base, 1).get.count() == 90)
    val h = SnapshotLog.history(spark, base).collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    assert(h.forall(_.getLong(6) > 0L))
  }
}
