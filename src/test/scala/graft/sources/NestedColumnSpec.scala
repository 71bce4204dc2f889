package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}

/** NESTED add-column evolution (`ALTER TABLE t ADD COLUMNS (s.x INT)`)
  * — the round-13 verdict's gap #3. ADD is metadata-only: files older
  * than the change read the new subfield as NULL; batches written
  * before OR after the change append without degrading the schema
  * header; rewrite paths (DELETE/replaceWhere/OPTIMIZE) conform the
  * footer-union struct shape to the evolved one. Nested RENAME/DROP
  * stay refused — without nested column mapping a re-added same-name
  * subfield would resurrect dropped bytes. */
class NestedColumnSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)
  import s.implicits._

  private def manifest(base: String): SnapshotLog.Manifest = {
    val bp = new Path(base)
    SnapshotLog.readManifest(
      bp.getFileSystem(s.sparkContext.hadoopConfiguration), bp).get
  }

  private def mkStructDf(n: Int, from: Int = 0) =
    (from until from + n).map(i => (i.toLong, (s"n$i", i * 2)))
      .toDF("id", "meta")
      .select(col("id"),
        struct(col("meta._1").as("name"), col("meta._2").as("score"))
          .as("meta"),
        (col("id") % 3).cast("string").as("p"))

  test("nested ADD: metadata-only, old files read NULL, appends keep the header") {
    val root = Files.createTempDirectory("graft_nest").toString
    s.conf.set("spark.sql.catalog.graft_n", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_n.root", root)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_n.db")
    val base = s"$root/db/t"
    mkStructDf(30).write.format("graft").partitionBy("p").save(base)
    val view = Catalog.registerSnapshotLog(s, "nestdb", "t", base, Some("p"))

    val mBefore = manifest(base)
    val vBefore = mBefore.version
    s.sql("ALTER TABLE graft_n.db.t ADD COLUMNS (meta.rank INT)")
    val m1 = manifest(base)
    assert(m1.version == vBefore + 1)
    assert(m1.allFiles == mBefore.allFiles, "nested ADD rewrites nothing")
    val evolved = m1.schema.get("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(evolved.fieldNames.toSeq == Seq("name", "score", "rank"))

    // old rows read the new subfield as NULL
    val t1 = s.sql("SELECT * FROM graft_n.db.t")
    assert(t1.count() == 30)
    assert(t1.filter(col("meta.rank").isNull).count() == 30)
    assert(t1.filter(col("meta.score") >= 0).count() == 30,
      "pre-existing subfields unchanged")

    // a batch carrying the NEW shape appends
    (100 until 110).map(i => (i.toLong, (s"n$i", i * 2, i)))
      .toDF("id", "meta")
      .select(col("id"),
        struct(col("meta._1").as("name"), col("meta._2").as("score"),
          col("meta._3").as("rank")).as("meta"),
        (col("id") % 3).cast("string").as("p"))
      .write.format("graft").mode("append").save(base)
    // a batch with the OLD shape (no rank) still appends, and the
    // schema header keeps the EVOLVED struct (no legacy degradation)
    mkStructDf(5, from = 200).write.format("graft").mode("append").save(base)
    val m2 = manifest(base)
    assert(m2.schema.isDefined, "old-shape append must not drop the header")
    assert(m2.schema.get("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("name", "score", "rank"))
    val t2 = s.sql("SELECT * FROM graft_n.db.t")
    assert(t2.count() == 45)
    assert(t2.filter(col("meta.rank").isNotNull).count() == 10)
    assert(t2.filter(col("id") >= 100 && col("id") < 110 &&
      col("meta.rank") === col("id").cast("int")).count() == 10)

    // rewrite paths conform mixed struct shapes: a row DELETE rewrites
    // partitions holding files both older and newer than the ADD
    s.sql(s"DELETE FROM $view WHERE id % 2 = 1")
    val t3 = s.sql("SELECT * FROM graft_n.db.t")
    assert(t3.count() == 23, "15 of 30 + 5 of 10 + 3 of 5 survive")
    assert(t3.filter(col("meta.rank").isNotNull).count() == 5)
    // OPTIMIZE folds across the shape boundary
    s.sql(s"OPTIMIZE $view")
    val t4 = s.sql("SELECT * FROM graft_n.db.t")
    assert(t4.count() == 23)
    assert(t4.filter(col("meta.rank").isNotNull).count() == 5)
    assert(t4.filter(col("meta.name").isNull).count() == 0)

    // time travel reads the PRE-ADD schema
    val old = s.read.format("graft")
      .option("versionAsOf", vBefore.toString).load(base)
    assert(old.select("meta.*").columns.toSeq == Seq("name", "score"))

    // nested RENAME/DROP are supported via nested column mapping
    // (round-15; dedicated tests below) — retype stays refused
    s.sql("ALTER TABLE graft_n.db.t RENAME COLUMN meta.score TO points")
    assert(s.sql("SELECT * FROM graft_n.db.t").schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("points"))
    s.sql("ALTER TABLE graft_n.db.t RENAME COLUMN meta.points TO score")
    val eRetype = intercept[Exception] {
      s.sql("ALTER TABLE graft_n.db.t ALTER COLUMN meta.score TYPE BIGINT") }
    assert(eRetype.getMessage.contains("nested") ||
      eRetype.getMessage.contains("retype") ||
      eRetype.getMessage.contains("meta"))
    // duplicate / missing-parent adds refuse
    val e3 = intercept[Exception] {
      s.sql("ALTER TABLE graft_n.db.t ADD COLUMNS (meta.rank INT)") }
    assert(e3.getMessage.contains("already exists"))
    val e4 = intercept[Exception] {
      s.sql("ALTER TABLE graft_n.db.t ADD COLUMNS (nosuch.x INT)") }
    assert(e4.getMessage.contains("no such column") ||
      e4.getMessage.contains("nosuch"))
    // a non-struct parent refuses
    val e5 = intercept[Exception] {
      s.sql("ALTER TABLE graft_n.db.t ADD COLUMNS (id.x INT)") }
    assert(e5.getMessage.contains("not a struct") ||
      e5.getMessage.contains("id"))
  }

  test("two-level nesting and replaceWhere across the shape boundary") {
    val base = Files.createTempDirectory("graft_nest2").toString + "/t"
    (0 until 12).map(i => (i.toLong, ((s"c$i", i), i * 1.0)))
      .toDF("id", "o")
      .select(col("id"),
        struct(
          struct(col("o._1._1").as("city"), col("o._1._2").as("zip"))
            .as("addr"),
          col("o._2").as("amt")).as("o"),
        (col("id") % 2).cast("string").as("p"))
      .write.format("graft").partitionBy("p").save(base)
    // add a field INSIDE the inner struct
    SnapshotLog.addNestedColumn(s, base, Seq("o", "addr", "geo"),
      org.apache.spark.sql.types.StructField("geo",
        org.apache.spark.sql.types.StringType))
    val t = s.read.format("graft").load(base)
    assert(t.select("o.addr.*").columns.toSeq == Seq("city", "zip", "geo"))
    assert(t.filter(col("o.addr.geo").isNull).count() == 12)

    // replaceWhere a partition: the kept+insert union spans old files
    // (no geo) and the new batch (with geo)
    val repl = (100 until 103).map(i => (i.toLong, ((s"c$i", i), i * 1.0, s"g$i")))
      .toDF("id", "o")
      .select(col("id"),
        struct(
          struct(col("o._1._1").as("city"), col("o._1._2").as("zip"),
            col("o._3").as("geo")).as("addr"),
          col("o._2").as("amt")).as("o"),
        lit("0").as("p"))
    repl.write.format("graft").mode("overwrite")
      .option("replaceWhere", "p = '0'").save(base)
    val t2 = s.read.format("graft").load(base)
    assert(t2.count() == 9, "6 kept in p=1, 3 replacing p=0")
    assert(t2.filter(col("o.addr.geo").isNotNull).count() == 3)
    assert(t2.filter(col("p") === "1" && col("o.addr.city").isNull)
      .count() == 0, "pre-ADD subfields survive the conform")
  }

  test("nested RENAME: metadata-only via column mapping, reads and writes rename-aware") {
    val base = Files.createTempDirectory("graft_nest_ren").toString + "/t"
    mkStructDf(12).write.format("graft").partitionBy("p").save(base)
    val filesBefore = manifest(base).allFiles
    SnapshotLog.renameNestedColumn(s, base, Seq("meta", "name"), "nm")
    val m1 = manifest(base)
    assert(m1.allFiles == filesBefore, "nested RENAME rewrites nothing")
    assert(m1.colmap == Map("meta.nm" -> "name"),
      s"dotted colmap entry expected, got ${m1.colmap}")
    // reads surface the NEW name over the OLD physical bytes
    val t1 = SnapshotLog.read(s, base).get
    val metaT = t1.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(metaT.fieldNames.toSeq == Seq("nm", "score"))
    assert(t1.filter(col("meta.nm") === "n3").count() == 1)
    // appends carry the NEW logical shape; on disk files keep the
    // physical name (old and new files union under one scan schema)
    (100 until 103).map(i => (i.toLong, (s"n$i", i * 2)))
      .toDF("id", "meta")
      .select(col("id"),
        struct(col("meta._1").as("nm"), col("meta._2").as("score")).as("meta"),
        (col("id") % 3).cast("string").as("p"))
      .write.format("graft").mode("append").save(base)
    val t2 = SnapshotLog.read(s, base).get
    assert(t2.count() == 15)
    assert(t2.filter(col("meta.nm") === "n100").count() == 1)
    assert(t2.filter(col("meta.nm").isNull).count() == 0)
    // a rewrite (row DELETE) conforms across the rename boundary
    SnapshotLog.deleteWhere(s, base, col("meta.nm") === "n5", "p").get
    val t3 = SnapshotLog.read(s, base).get
    assert(t3.count() == 14 && t3.filter(col("meta.nm") === "n5").count() == 0)
    // time travel to the pre-rename version answers with the OLD name
    val (dfOld) = SnapshotRelation.read(s, base, versionAsOf = Some(1L)).get
    assert(dfOld.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("name", "score"))
  }

  test("nested DROP + same-name re-ADD: the dropped bytes never resurrect") {
    val base = Files.createTempDirectory("graft_nest_drop").toString + "/t"
    mkStructDf(12).write.format("graft").partitionBy("p").save(base)
    val filesBefore = manifest(base).allFiles
    SnapshotLog.dropNestedColumn(s, base, Seq("meta", "score"))
    val m1 = manifest(base)
    assert(m1.allFiles == filesBefore, "nested DROP rewrites nothing")
    assert(m1.dropped == Set("meta.score"))
    val t1 = SnapshotLog.read(s, base).get
    assert(t1.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("name"), "the field is gone from reads")
    // re-ADD the same name: must claim a FRESH physical slot
    SnapshotLog.addNestedColumn(s, base, Seq("meta", "score"),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.IntegerType))
    val m2 = manifest(base)
    assert(m2.colmap.keySet == Set("meta.score") &&
      m2.colmap("meta.score") != "score",
      s"re-added field must map to a fresh physical slot, got ${m2.colmap}")
    val t2 = SnapshotLog.read(s, base).get
    assert(t2.filter(col("meta.score").isNotNull).count() == 0,
      "old files' dropped bytes must read as NULL, never resurrect")
    // new writes land values in the fresh slot and read back
    (200 until 203).map(i => (i.toLong, (s"n$i", i * 7)))
      .toDF("id", "meta")
      .select(col("id"),
        struct(col("meta._1").as("name"), col("meta._2").as("score")).as("meta"),
        (col("id") % 3).cast("string").as("p"))
      .write.format("graft").mode("append").save(base)
    val t3 = SnapshotLog.read(s, base).get
    assert(t3.filter(col("meta.score") === 1400).count() == 1)
    assert(t3.filter(col("id") < 100 && col("meta.score").isNotNull).count() == 0)
    // a rewrite (OPTIMIZE) materializes the removal without reviving it
    SnapshotLog.optimizeTable(s, base, "p", minFiles = 1)
    val t4 = SnapshotLog.read(s, base).get
    assert(t4.filter(col("id") < 100 && col("meta.score").isNotNull).count() == 0)
    assert(t4.filter(col("meta.score") === 1400).count() == 1)
  }

  test("nested rename/drop through the SQL catalog surface") {
    val root = Files.createTempDirectory("graft_nest_sql").toString
    s.conf.set("spark.sql.catalog.graft_nm", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_nm.root", root)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_nm.db")
    val base = s"$root/db/t"
    mkStructDf(9).write.format("graft").partitionBy("p").save(base)
    s.sql("ALTER TABLE graft_nm.db.t RENAME COLUMN meta.name TO label")
    assert(s.sql("SELECT meta.label FROM graft_nm.db.t WHERE id = 4")
      .head.getString(0) == "n4")
    s.sql("ALTER TABLE graft_nm.db.t DROP COLUMN meta.score")
    val metaT = s.sql("SELECT * FROM graft_nm.db.t").schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(metaT.fieldNames.toSeq == Seq("label"))
  }

  test("a batch with an EXTRA nested subfield refuses instead of silently dropping it") {
    val base = Files.createTempDirectory("graft_nest_extra").toString + "/t"
    mkStructDf(12).write.format("graft").partitionBy("p").save(base)
    // the batch's struct carries a subfield the table schema lacks —
    // aligning it away would be silent data loss (Delta refuses the
    // same batch without mergeSchema); the replace must error loudly
    // and commit NOTHING
    val extra = (0 until 3).map(i => (i.toLong, (s"x$i", i, i * 9)))
      .toDF("id", "meta")
      .select(col("id"),
        struct(col("meta._1").as("name"), col("meta._2").as("score"),
          col("meta._3").as("bonus")).as("meta"),
        lit("0").as("p"))
    val vBefore = manifest(base).version
    val e = intercept[Exception] {
      SnapshotLog.replaceWhere(s, base, extra, col("p") === "0", "p")
    }
    assert(e.getMessage.contains("bonus"), e.getMessage)
    assert(manifest(base).version == vBefore, "failed replace must not commit")
    // the dynamic-partition-overwrite surface routes through the same
    // strict align
    val e2 = intercept[Exception] {
      extra.write.format("graft").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").save(base)
    }
    assert(e2.getMessage.contains("bonus"), e2.getMessage)
    // MISSING subfields still backfill NULL (the evolution feature the
    // strictness must not break)
    val missing = (20 until 23).map(i => (i.toLong, s"m$i"))
      .toDF("id", "nm")
      .select(col("id"), struct(col("nm").as("name")).as("meta"),
        lit("0").as("p"))
    SnapshotLog.replaceWhere(s, base, missing, col("p") === "0", "p").get
    val t = SnapshotLog.read(s, base).get
    assert(t.filter(col("p") === "0").count() == 3)
    assert(t.filter(col("id") === 20L).select("meta.score").head.isNullAt(0))
  }
}
