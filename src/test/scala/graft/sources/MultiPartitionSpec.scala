package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}

/** MULTI-COLUMN identity partitioning — `PARTITIONED BY (y, m)`,
  * Delta/Hive's bread-and-butter compound layout and the round-13
  * verdict's top gap. The layout threads as the comma-joined column
  * list through every signature; the manifest key is the `/`-joined
  * per-component encoding (components percent-escape `%` and `/`, so
  * key→components is injective for any string values). Each test
  * exercises one slice of the whole surface: write + layout guard,
  * typed exposure + pruning on either column, replaceWhere, dynamic
  * partition overwrite, metadata DELETE, OPTIMIZE (WHERE), CDF, MERGE
  * partition moves, catalog DDL, and hostile string values. */
class MultiPartitionSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  /** 120 rows over y ∈ {2023, 2024}, m ∈ {1, 2, 3}: 6 cells, 20 each. */
  private def rowsDf(): DataFrame = {
    import s.implicits._
    (0 until 120).map(i =>
      (i.toLong, 2023 + (i % 2), 1 + (i / 2) % 3, s"v$i"))
      .toDF("id", "y", "m", "s")
  }

  private def manifest(base: String): SnapshotLog.Manifest = {
    val bp = new Path(base)
    SnapshotLog.readManifest(
      bp.getFileSystem(s.sparkContext.hadoopConfiguration), bp).get
  }

  private def readT(base: String): DataFrame =
    s.read.format("graft").load(base)

  private def allScans(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p.collect {
      case sc: FileSourceScanExec => Seq(sc)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
    }.flatten

  test("write stamps the layout; keys are composite; reads round-trip") {
    val base = Files.createTempDirectory("graft_mp1").toString + "/t"
    rowsDf().write.format("graft").partitionBy("y", "m").save(base)
    val m = manifest(base)
    assert(m.props.get(SnapshotLog.PartColProp).contains("y,m"))
    assert(m.files.keySet == Set("2023/1", "2023/2", "2023/3",
      "2024/1", "2024/2", "2024/3"))
    assert(readT(base).count() == 120)
    assert(readT(base).columns.toSeq == Seq("id", "y", "m", "s"))
    // values survive the manifest-key round trip bit-exactly
    val back = readT(base).groupBy("y", "m").count().collect()
    assert(back.length == 6 && back.forall(_.getLong(2) == 20))

    // contradicting layouts fail loudly, in both directions
    val e1 = intercept[Exception] {
      rowsDf().write.format("graft").mode("append").partitionBy("y").save(base)
    }
    assert(e1.getMessage.contains("partitioned by"))
    val e2 = intercept[Exception] {
      rowsDf().write.format("graft").mode("append")
        .partitionBy("m", "y").save(base) // order is part of the layout
    }
    assert(e2.getMessage.contains("partitioned by"))
    // appends under the declared layout need no partitionBy at all
    rowsDf().withColumn("id", col("id") + 1000)
      .write.format("graft").mode("append").save(base)
    assert(readT(base).count() == 240)
  }

  test("typed exposure: both columns are real partition columns; either prunes") {
    val base = Files.createTempDirectory("graft_mp2").toString + "/t"
    rowsDf().write.format("graft").partitionBy("y", "m").save(base)
    val (df, idx) = SnapshotRelation
      .applyWithIndex(s, base, partCol = Some("y,m")).get
    assert(idx.partitionSchema.fieldNames.toSeq == Seq("y", "m"))

    def prunedCount(filtered: DataFrame): (Int, Int) = {
      filtered.collect()
      idx.lastPruned.get
    }
    val total = manifest(base).allFiles.size
    // one column alone
    val (s1, t1) = prunedCount(df.filter(col("y") === 2023))
    assert(t1 == total && s1 < total, s"y-only prune: $s1/$t1")
    val (s2, t2) = prunedCount(df.filter(col("m") === 2))
    assert(t2 == total && s2 < total, s"m-only prune: $s2/$t2")
    // both together: exactly one cell's files
    val (s3, _) = prunedCount(df.filter(col("y") === 2024 && col("m") === 3))
    assert(s3 == manifest(base).files("2024/3").size)
    // results are exact, not just pruned
    assert(df.filter(col("y") === 2023 && col("m") === 1).count() == 20)
    // partition filters land as real partition filters in the scan
    val scan = allScans(
      df.filter(col("y") === 2024).queryExecution.executedPlan).head
    assert(scan.partitionFilters.nonEmpty,
      "filter on y routed as a partition filter, not a data filter")
  }

  test("replaceWhere scopes one cell; dynamic overwrite replaces touched cells only") {
    val base = Files.createTempDirectory("graft_mp3").toString + "/t"
    rowsDf().write.format("graft").partitionBy("y", "m").save(base)

    // replaceWhere on both components
    val repl = rowsDf().filter(col("y") === 2023 && col("m") === 2)
      .withColumn("s", lit("replaced"))
    repl.write.format("graft").mode("overwrite")
      .option("replaceWhere", "y = 2023 AND m = 2").save(base)
    val t = readT(base)
    assert(t.filter(col("s") === "replaced").count() == 20)
    assert(t.count() == 120)

    // dynamic partition overwrite: a batch touching (2024, 1) and
    // (2024, 2) replaces exactly those cells
    val dyn = rowsDf().filter(col("y") === 2024 && col("m") <= 2)
      .withColumn("s", lit("dyn"))
    dyn.write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(base)
    val t2 = readT(base)
    assert(t2.filter(col("s") === "dyn").count() == 40)
    assert(t2.filter(col("s") === "replaced").count() == 20,
      "untouched cells keep their rows")
    assert(t2.count() == 120)
  }

  test("partition-predicate DELETE on either column is metadata-only") {
    val base = Files.createTempDirectory("graft_mp4").toString + "/t"
    rowsDf().write.format("graft").partitionBy("y", "m").save(base)
    val filesBefore = manifest(base).allFiles.toSet

    // predicate on ONE component: whole partitions drop, zero rewrites
    val out = SnapshotLog.deleteWhere(s, base, col("m") === 3, "y,m").get
    assert(out.metadataOnly, "m-only predicate takes the metadata path")
    val m1 = manifest(base)
    assert(m1.files.keySet == Set("2023/1", "2023/2", "2024/1", "2024/2"))
    assert(m1.allFiles.toSet.subsetOf(filesBefore), "no files rewritten")
    assert(readT(base).count() == 80)

    // predicate on BOTH components
    val out2 = SnapshotLog.deleteWhere(s, base,
      col("y") === 2023 && col("m") === 1, "y,m").get
    assert(out2.metadataOnly)
    assert(readT(base).count() == 60)

    // a data predicate still takes the row path
    val out3 = SnapshotLog.deleteWhere(s, base, col("id") < 10, "y,m").get
    assert(!out3.metadataOnly)
    assert(readT(base).filter(col("id") < 10).count() == 0)
  }

  test("OPTIMIZE folds per cell; OPTIMIZE WHERE selects by either component") {
    val base = Files.createTempDirectory("graft_mp5").toString + "/t"
    rowsDf().write.format("graft").partitionBy("y", "m").save(base)
    rowsDf().withColumn("id", col("id") + 500)
      .write.format("graft").mode("append").save(base)
    val view = Catalog.registerSnapshotLog(s, "mpdb", "t", base, Some("y,m"))

    val m0 = manifest(base)
    assert(m0.files.values.exists(_.size > 1), "fragmented before OPTIMIZE")
    s.sql(s"OPTIMIZE $view WHERE y = 2023")
    val m1 = manifest(base)
    assert(Seq("2023/1", "2023/2", "2023/3").forall(p =>
      m1.files(p).size == 1), "selected cells folded")
    assert(Seq("2024/1", "2024/2", "2024/3").forall(p =>
      m1.files(p) == m0.files(p)), "unselected cells untouched")
    s.sql(s"OPTIMIZE $view")
    assert(manifest(base).files.values.forall(_.size == 1))
    assert(readT(base).count() == 240)
  }

  test("CDF and MERGE partition moves across one component") {
    val base = Files.createTempDirectory("graft_mp6").toString + "/t"
    rowsDf().write.format("graft").save(base) // hint-less first write…
    // …is unpartitioned; recreate properly
    val base2 = Files.createTempDirectory("graft_mp6b").toString + "/t"
    rowsDf().write.format("graft").partitionBy("y", "m").save(base2)
    SnapshotLog.setProperties(s, base2, Map(SnapshotLog.CdfProp -> "true"))
    val view = Catalog.registerSnapshotLog(s, "mpdb2", "t", base2, Some("y,m"))

    // MERGE that MOVES id 0 from (2023,1) to (2024,3): the old cell
    // must rewrite too or the old row survives beside the new one
    import s.implicits._
    Seq((0L, 2024, 3, "moved")).toDF("id", "y", "m", "s")
      .createOrReplaceTempView("mp6_src")
    s.sql(s"""MERGE INTO $view t USING mp6_src src ON t.id = src.id
              WHEN MATCHED THEN UPDATE SET *
              WHEN NOT MATCHED THEN INSERT *""")
    val t = readT(base2)
    assert(t.count() == 120, "moved, not duplicated")
    assert(t.filter(col("id") === 0).select("y", "m").head ==
      org.apache.spark.sql.Row(2024, 3))
    assert(t.filter(col("id") === 0 && col("y") === 2023).count() == 0,
      "no ghost row in the source cell")

    // CDF captured the move as typed update images
    val cdf = SnapshotLog.readCdf(s, base2).get
    assert(cdf.filter(col("change_type") === "update_preimage" &&
      col("id") === 0).count() == 1)
    assert(cdf.filter(col("change_type") === "update_postimage" &&
      col("id") === 0 && col("y") === 2024).count() == 1)
  }

  test("catalog DDL: CREATE/CTAS PARTITIONED BY (y, m), INSERT, evolution guards") {
    val root = Files.createTempDirectory("graft_mpcat").toString
    s.conf.set("spark.sql.catalog.graft_mp", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mp.root", root)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_mp.db")
    rowsDf().createOrReplaceTempView("mp_src")

    s.sql("""CREATE TABLE graft_mp.db.t1 (id BIGINT, y INT, m INT, s STRING)
             USING graft PARTITIONED BY (y, m)""")
    assert(manifest(s"$root/db/t1").props
      .get(SnapshotLog.PartColProp).contains("y,m"))
    s.sql("INSERT INTO graft_mp.db.t1 SELECT * FROM mp_src")
    assert(s.sql("SELECT COUNT(*) FROM graft_mp.db.t1").head.getLong(0) == 120)
    assert(manifest(s"$root/db/t1").files.keySet.size == 6)

    // atomic CTAS with compound partitioning
    s.sql("""CREATE TABLE graft_mp.db.t2 USING graft PARTITIONED BY (y, m)
             AS SELECT * FROM mp_src WHERE m <= 2""")
    assert(manifest(s"$root/db/t2").files.keySet ==
      Set("2023/1", "2023/2", "2024/1", "2024/2"))

    // pruning through the catalog read path
    assert(s.sql(
      "SELECT COUNT(*) FROM graft_mp.db.t1 WHERE y = 2023 AND m = 1")
      .head.getLong(0) == 20)

    // DESCRIBE-visible layout: one identity transform per column
    val tbl = s.sessionState.catalogManager.catalog("graft_mp")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), "t1"))
    assert(tbl.partitioning().map(_.describe()).toSeq == Seq("y", "m"))

    // neither partition column may be renamed/dropped/retyped
    val e1 = intercept[Exception] {
      s.sql("ALTER TABLE graft_mp.db.t1 DROP COLUMN m") }
    assert(e1.getMessage.contains("partition column"))
    val e2 = intercept[Exception] {
      s.sql("ALTER TABLE graft_mp.db.t1 RENAME COLUMN y TO yy") }
    assert(e2.getMessage.contains("partition column"))

    // INSERT OVERWRITE replaces the snapshot under the layout
    s.sql("INSERT OVERWRITE graft_mp.db.t2 SELECT * FROM mp_src WHERE m = 1")
    assert(manifest(s"$root/db/t2").files.keySet ==
      Set("2023/1", "2024/1"))
  }

  test("hostile string partition values: '/' and '%' round-trip injectively") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_mp7").toString + "/t"
    // 'a/b' vs 'a' + 'b' split across columns must not collide; '%2F'
    // as a literal value must not decode into '/'
    val df = Seq(
      (1L, "a/b", "c", "x1"),
      (2L, "a", "b/c", "x2"),
      (3L, "%2F", "d", "x3"),
      (4L, "p%e", "q/r", "x4"))
      .toDF("id", "k1", "k2", "s")
    df.write.format("graft").partitionBy("k1", "k2").save(base)
    val m = manifest(base)
    assert(m.files.keySet.size == 4, "four distinct composite keys")
    val t = readT(base)
    assert(t.count() == 4)
    assert(t.filter(col("k1") === "a/b" && col("k2") === "c")
      .select("id").head.getLong(0) == 1L)
    assert(t.filter(col("k1") === "a" && col("k2") === "b/c")
      .select("id").head.getLong(0) == 2L)
    assert(t.filter(col("k1") === "%2F").select("id").head.getLong(0) == 3L)
    assert(t.filter(col("k2") === "q/r").select("id").head.getLong(0) == 4L)
    // metadata delete by a hostile value drops exactly its partition
    val out = SnapshotLog.deleteWhere(s, base, col("k1") === "a/b", "k1,k2").get
    assert(out.metadataOnly)
    assert(readT(base).count() == 3)

    // NULL in any component refuses loudly
    val eNull = intercept[Exception] {
      Seq((9L, null: String, "z", "x")).toDF("id", "k1", "k2", "s")
        .write.format("graft").mode("append").save(base)
    }
    assert(eNull.getMessage.contains("NULL"))
  }

  test("metadata agg folds COUNT(*) and per-component MIN/MAX from the manifest") {
    val base = Files.createTempDirectory("graft_mp8").toString + "/t"
    rowsDf().write.format("graft").partitionBy("y", "m").save(base)
    val df = readT(base)
    val agg = df.agg(
      count(lit(1)).as("n"),
      min("y").as("min_y"), max("y").as("max_y"),
      min("m").as("min_m"), max("m").as("max_m"))
    val optimized = agg.queryExecution.optimizedPlan
    assert(optimized.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      s"expected a manifest fold, got:\n$optimized")
    val r = agg.head
    assert(r.getLong(0) == 120 && r.getInt(1) == 2023 && r.getInt(2) == 2024 &&
      r.getInt(3) == 1 && r.getInt(4) == 3)
  }

  test("convert-in-place adopts an existing two-level hive layout") {
    import s.implicits._
    val raw = Files.createTempDirectory("graft_mp9").toString + "/t"
    // files carry the partition columns in CONTENT, one (y, m) each —
    // the convert contract
    rowsDf().write.partitionBy("y", "m").parquet(raw)
    val rewritten = Files.createTempDirectory("graft_mp9b").toString + "/t"
    // one flat file per (y, m) — the convert contract (each file must
    // hold exactly one partition tuple)
    for (y <- 2023 to 2024; m <- 1 to 3)
      s.read.parquet(raw).filter(col("y") === y && col("m") === m)
        .select("id", "y", "m", "s")
        .coalesce(1).write.mode("append").parquet(rewritten)
    val v = SnapshotLog.convertInPlace(s, rewritten, "y,m")
    assert(v == 1L)
    val m = manifest(rewritten)
    assert(m.files.keySet.size == 6)
    assert(m.files.keySet.forall(_.matches("""202\d/\d""")))
    assert(readT(rewritten).count() == 120)
  }
}
