package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}

/** The DSv2 catalog namespace, graded on the one property it exists
  * for: `SELECT … FROM graft.ns.t` must read through the
  * planner-integrated, deletion-vector-correct relation — and must
  * fail closed (not resurrect rows) when the substitution rule is
  * absent. */
class GraftCatalogSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  private lazy val root = {
    val r = Files.createTempDirectory("graft_cat_root").toString
    val base = r + "/db1/t1"
    import s.implicits._
    val rows = (1L to 300L).map(i => (i, i * 1.5, s"d${i % 3}"))
      .toDF("id", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Seq("id"),
      clusterBy = Nil, clusterFiles = 8, opCol = None, writeCdf = false)
    SnapshotLog.setProperties(s, base, Map(SnapshotLog.PartColProp -> "day"))
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root", r)
    r
  }
  private lazy val base = root + "/db1/t1"

  test("SELECT through the catalog namespace; DELETE's deletion vectors honored") {
    root // force setup (registers the catalog confs)
    assert(s.sql("SELECT COUNT(*) FROM graft.db1.t1").head.getLong(0) == 300)
    val vBefore = SnapshotLog.readManifest(
      new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration),
      new Path(base)).get.version

    // merge-on-read delete (DVs, no file rewrites)
    SnapshotLog.deleteWhere(s, base, col("id") % 10 === 3, "day",
      deletionVectors = true)

    // the resurrect check: a catalog SELECT must see the DVs
    assert(s.sql("SELECT COUNT(*) FROM graft.db1.t1").head.getLong(0) == 270)
    assert(s.sql("SELECT COUNT(*) FROM graft.db1.t1 WHERE id % 10 = 3")
      .head.getLong(0) == 0, "deleted rows resurrected through the catalog")

    // time travel re-reads the pre-delete snapshot
    assert(s.sql(s"SELECT COUNT(*) FROM graft.db1.t1 VERSION AS OF $vBefore")
      .head.getLong(0) == 300)

    // self-join through the catalog: fresh exprIds per occurrence
    assert(s.sql(
      """SELECT COUNT(*) FROM graft.db1.t1 a
         JOIN graft.db1.t1 b ON a.id = b.id""").head.getLong(0) == 270)
  }

  test("TIMESTAMP AS OF resolves through the commit clock") {
    root // force setup (and the DV delete from the first test, if it ran)
    val fs = new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration)
    val live = SnapshotLog.readManifest(fs, new Path(base)).get.version
    // far-future timestamp resolves to the LIVE version's rows
    val nLive = s.sql("SELECT COUNT(*) FROM graft.db1.t1").head.getLong(0)
    assert(s.sql(
      "SELECT COUNT(*) FROM graft.db1.t1 TIMESTAMP AS OF '2100-01-01 00:00:00'")
      .head.getLong(0) == nLive, s"future-timestamp read must pin v$live")
    // a pre-table timestamp has no version to resolve to
    intercept[Exception] {
      s.sql("SELECT * FROM graft.db1.t1 TIMESTAMP AS OF '1990-01-01 00:00:00'")
        .collect()
    }
  }

  test("catalog reads are planner-integrated: FileSourceScan with pushed filters") {
    root // force setup
    val qe = s.sql("SELECT id FROM graft.db1.t1 WHERE id = 5").queryExecution
    val p = qe.executedPlan.toString
    assert(p.contains("Scan parquet"), s"expected a v1 parquet scan:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(id), EqualTo(id,5)")
      || p.contains("PushedFilters: [EqualTo(id,5)"), s"filter must push:\n$p")
    assert(!p.contains("BatchScan"), "must not plan a DV-less v2 scan")
  }

  test("SHOW TABLES / namespaces resolve from the directory layout") {
    root // force setup
    val tables = s.sql("SHOW TABLES IN graft.db1").collect().map(_.getString(1))
    assert(tables.contains("t1"))
    val nss = s.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0))
    assert(nss.contains("db1"))
  }

  test("format(\"graft\"): path-addressed reads with DV + time travel") {
    root // force setup (table t1 has a DV delete from the first test)
    val df = s.read.format("graft").load(base)
    assert(df.count() == 270, "DVs must apply through format(\"graft\")")
    assert(df.filter(col("id") % 10 === 3).count() == 0)
    // time travel option: the version before the DV delete sees 300
    val live = SnapshotLog.readManifest(
      new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration),
      new Path(base)).get.version
    val v0 = s.read.format("graft")
      .option("versionAsOf", (live - 1).toString).load(base)
    assert(v0.count() == 300)
    // the physical plan is the v1 substitution, not a DV-less BatchScan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Scan parquet") && !p.contains("BatchScan"), p)
    // fail closed without the extension rule
    intercept[Exception] {
      spark.read.format("graft").load(base).collect()
    }
  }

  test("manifest-stats planning: a small catalog table auto-broadcasts, AQE off") {
    root // force setup
    // no file listing, no footer reads: the relation's sizeInBytes
    // synthesizes from the manifest's recorded byte lengths, so the
    // STATIC planner (AQE off — no runtime re-plan to save us) must
    // already know the by-name table is under the broadcast threshold
    val prev = s.conf.get("spark.sql.adaptive.enabled")
    try {
      s.conf.set("spark.sql.adaptive.enabled", "false")
      val big = s.range(0, 200000).select(
        (col("id") % 300 + 1).as("id"), col("id").as("payload"))
      val joined = big.join(s.table("graft.db1.t1"), Seq("id"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"small catalog-name table must broadcast from manifest stats:\n$p")
      assert(joined.count() > 0)
    } finally s.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("RENAME TO moves the table with history intact; old name gone") {
    root // force setup
    import s.implicits._
    val rbase = root + "/db1/rsrc"
    val rows = (1L to 60L).map(i => (i, s"d${i % 2}")).toDF("id", "day")
    SnapshotLog.appendBatch(s, rbase, rows, "day", batchId = 1,
      propsAdd = Map(SnapshotLog.PartColProp -> "day"))
    SnapshotLog.appendBatch(s, rbase,
      rows.withColumn("id", col("id") + 100), "day", batchId = 2)

    // the RENAME TO target is CATALOG-RELATIVE in Spark's grammar
    s.sql("ALTER TABLE graft.db1.rsrc RENAME TO db1.rdst")
    assert(s.sql("SELECT COUNT(*) FROM graft.db1.rdst").head.getLong(0) == 120,
      "the new name reads the full table")
    assert(s.sql("SELECT COUNT(*) FROM graft.db1.rdst VERSION AS OF 1")
      .head.getLong(0) == 60,
      "time travel reaches across the rename")
    intercept[Exception] {
      s.sql("SELECT COUNT(*) FROM graft.db1.rsrc").collect()
    }
    assert(!new java.io.File(rbase).exists(), "old directory gone")
    // renaming ONTO an existing table refuses
    rows.limit(1).write.format("graft").save(root + "/db1/rother")
    intercept[Exception] {
      s.sql("ALTER TABLE graft.db1.rdst RENAME TO db1.rother")
    }
    assert(s.sql("SELECT COUNT(*) FROM graft.db1.rdst").head.getLong(0) == 120,
      "a refused rename leaves the source untouched")
  }

  test("SHALLOW CLONE from a dotted catalog source") {
    root // force setup
    val loc = Files.createTempDirectory("graft_cloned").toString + "/c"
    s.sql(s"CREATE TABLE clonedb.c1 SHALLOW CLONE graft.db1.t1 LOCATION '$loc'")
    val n = s.sql("SELECT COUNT(*) FROM graft.db1.t1").head.getLong(0)
    assert(s.sql("SELECT COUNT(*) FROM clonedb_c1").head.getLong(0) == n,
      "the clone reads the source's snapshot by reference")
  }

  test("DSv2 UpdateColumnType routes through the widening machinery") {
    root // force setup
    import s.implicits._
    val r2 = Files.createTempDirectory("graft_cat_uct").toString
    s.conf.set("spark.sql.catalog.graft_uct", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_uct.root", r2)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_uct.db")
    s.sql("CREATE TABLE graft_uct.db.t (id BIGINT, flag INT) USING graft")
    s.sql("INSERT INTO graft_uct.db.t VALUES (1, 7), (2, 9)")
    // the DSv2 TableChange path directly — not the custom-verb parse
    val cat = s.sessionState.catalogManager.catalog("graft_uct")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "t")
    cat.alterTable(ident,
      org.apache.spark.sql.connector.catalog.TableChange.updateColumnType(
        Array("flag"), org.apache.spark.sql.types.LongType))
    val tdf = s.sql("SELECT * FROM graft_uct.db.t")
    assert(tdf.schema("flag").dataType == org.apache.spark.sql.types.LongType,
      "SQL-standard spelling must widen reader-visibly")
    assert(tdf.select(sum("flag")).head.getLong(0) == 16L)
    // a NARROWING retype still refuses inside the shared machinery
    val err = intercept[Exception] {
      cat.alterTable(ident,
        org.apache.spark.sql.connector.catalog.TableChange.updateColumnType(
          Array("flag"), org.apache.spark.sql.types.IntegerType))
    }
    assert(err.getMessage.toLowerCase.contains("widen") ||
      err.getMessage.toLowerCase.contains("lossless") ||
      err.getMessage.toLowerCase.contains("cannot"))
  }

  test("without the substitution rule, reads fail closed (never DV-less)") {
    root // force setup
    // the base session has the catalog confs (shared SparkContext conf
    // reads are per-session: set them here too) but NOT the extensions
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
    val e = intercept[Exception] {
      spark.sql("SELECT COUNT(*) FROM graft.db1.t1").collect()
    }
    assert(!e.isInstanceOf[IllegalStateException])
  }
}
