package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}

/** The WRITE half of the DSv2 surface: `df.write.format("graft")`,
  * `option("replaceWhere", …)`, CTAS / INSERT INTO / INSERT OVERWRITE
  * through the catalog — all of which must funnel into SnapshotLog's
  * transactional writers (one commit protocol, not a weaker second
  * path). Graded structurally: a table written through the format is
  * indistinguishable (schema header, partition layout, properties,
  * rows, feature behavior) from one written through the Scala API. */
class DsvWriteSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)
  import scala.jdk.CollectionConverters._

  private def rowsDf(n: Long): DataFrame = {
    import s.implicits._
    (1L to n).map(i => (i, i * 1.5, s"d${i % 3}")).toDF("id", "value", "day")
  }

  private def manifest(base: String): SnapshotLog.Manifest = {
    val bp = new Path(base)
    SnapshotLog.readManifest(
      bp.getFileSystem(s.sparkContext.hadoopConfiguration), bp).get
  }

  private def readT(base: String): DataFrame =
    s.read.format("graft").load(base)

  test("fresh-path save + partitionBy creates the table; append/overwrite modes") {
    val base = Files.createTempDirectory("graft_w1").toString + "/t"
    rowsDf(90).write.format("graft").partitionBy("day").save(base)
    val m1 = manifest(base)
    assert(m1.version == 1L)
    assert(m1.props.get(SnapshotLog.PartColProp).contains("day"),
      "first write must stamp the partition column property")
    assert(m1.files.keySet == Set("d0", "d1", "d2"))
    assert(readT(base).count() == 90)

    // append — no partitionBy needed, the manifest knows the column
    rowsDf(90).withColumn("id", col("id") + 1000)
      .write.format("graft").mode("append").save(base)
    assert(readT(base).count() == 180)

    // full overwrite replaces the snapshot, keeps properties
    rowsDf(30).write.format("graft").mode("overwrite").save(base)
    val m3 = manifest(base)
    assert(readT(base).count() == 30)
    assert(m3.props.get(SnapshotLog.PartColProp).contains("day"))
    assert(m3.op.contains("OVERWRITE"))

    // history intact: version 1 still readable (time travel)
    assert(s.read.format("graft").option("versionAsOf", "1")
      .load(base).count() == 90)
  }

  test("replaceWhere overwrites exactly the predicate's region") {
    val base = Files.createTempDirectory("graft_w2").toString + "/t"
    rowsDf(90).write.format("graft").partitionBy("day").save(base)
    val repl = rowsDf(9).filter(col("day") === "d1")
      .withColumn("value", lit(-1.0))
    repl.write.format("graft").mode("overwrite")
      .option("replaceWhere", "day = 'd1'").save(base)
    val t = readT(base)
    assert(t.filter(col("day") === "d1").count() == 3)
    assert(t.filter(col("day") === "d1" && col("value") =!= -1.0).count() == 0)
    assert(t.filter(col("day") =!= "d1").count() == 60,
      "rows outside the replaced region must survive untouched")
    // a violating batch (rows outside the predicate) is rejected
    val bad = intercept[Exception] {
      rowsDf(9).write.format("graft").mode("overwrite")
        .option("replaceWhere", "day = 'd1'").save(base)
    }
    assert(bad.getMessage.contains("REPLACE WHERE"))
    // replaceWhere without overwrite mode is a contract violation
    val modeErr = intercept[Exception] {
      repl.write.format("graft").mode("append")
        .option("replaceWhere", "day = 'd1'").save(base)
    }
    assert(modeErr.getMessage.contains("overwrite"))
  }

  test("written-through-format == written-through-API (structural parity)") {
    val root = Files.createTempDirectory("graft_w3").toString
    val viaFormat = root + "/fmt"
    val viaApi = root + "/api"
    val batch = rowsDf(120)
    batch.write.format("graft").partitionBy("day").save(viaFormat)
    SnapshotLog.appendBatch(s, viaApi, batch, "day", batchId = 0L,
      propsAdd = Map(SnapshotLog.PartColProp -> "day"))
    val (mf, ma) = (manifest(viaFormat), manifest(viaApi))
    assert(mf.version == ma.version)
    assert(mf.schemaJson == ma.schemaJson, "identical logical schema header")
    assert(mf.files.keySet == ma.files.keySet, "identical partition layout")
    assert(mf.files.map { case (p, fs) => p -> fs.size } ==
      ma.files.map { case (p, fs) => p -> fs.size })
    assert(mf.props == ma.props)
    assert(mf.op == ma.op)
    assert(readT(viaFormat).exceptAll(readT(viaApi)).isEmpty &&
      readT(viaApi).exceptAll(readT(viaFormat)).isEmpty,
      "identical rows")
  }

  test("CDF and row tracking flow through format writes") {
    val base = Files.createTempDirectory("graft_w4").toString + "/t"
    rowsDf(60).write.format("graft").partitionBy("day").save(base)
    SnapshotLog.setProperties(s, base, Map(
      SnapshotLog.CdfProp -> "true",
      SnapshotLog.RowTrackingProp -> "true"))
    rowsDf(60).withColumn("id", col("id") + 100)
      .write.format("graft").mode("append").save(base)
    val cdf = SnapshotLog.readCdf(s, base).get
    assert(cdf.filter(col("change_type") === "insert").count() == 60,
      "a format append on a CDF table must publish its feed")
    // row ids are identity METADATA: the format read exposes the
    // logical schema only (like Delta); the id column comes via the
    // snapshot-relation API
    val ids = SnapshotRelation.read(s, base, None, Some("day")).get
      .select(col(SnapshotLog.RowIdCol))
    assert(ids.distinct().count() == 120, "row ids allocated and unique")
    // an appended CHECK constraint is enforced on the format path too
    SnapshotLog.addConstraint(s, base, "pos_value", "value >= 0")
    val err = intercept[Exception] {
      rowsDf(3).withColumn("value", lit(-5.0))
        .write.format("graft").mode("append").save(base)
    }
    assert(err.getMessage.toLowerCase.contains("constraint") ||
      err.getMessage.contains("pos_value"))
  }

  test("writes to a time-traveled snapshot are rejected") {
    val base = Files.createTempDirectory("graft_w5").toString + "/t"
    rowsDf(30).write.format("graft").partitionBy("day").save(base)
    rowsDf(30).write.format("graft").mode("append").save(base)
    val err = intercept[Exception] {
      rowsDf(3).write.format("graft").mode("append")
        .option("versionAsOf", "1").save(base)
    }
    assert(err.getMessage.contains("time-traveled"))
  }

  test("a fresh-path write without partitionBy creates an UNPARTITIONED table") {
    val base = Files.createTempDirectory("graft_w6").toString + "/t"
    // Delta's default table shape: no partitioning required
    rowsDf(9).write.format("graft").save(base)
    val m = manifest(base)
    assert(m.props.get(SnapshotLog.PartColProp).contains(SnapshotLog.NoPartCol),
      "first write stamps the explicit unpartitioned marker")
    assert(m.files.keySet == Set(SnapshotLog.SinglePart))
    assert(readT(base).count() == 9)
    // option("partitionCol", …) is still the accepted spelling for a
    // PARTITIONED fresh-path write without partitionBy
    val base2 = Files.createTempDirectory("graft_w6b").toString + "/t"
    rowsDf(9).write.format("graft")
      .option(WriteIntoGraft.PartitionColOption, "day").save(base2)
    assert(manifest(base2).props.get(SnapshotLog.PartColProp).contains("day"))
  }

  test("partitionBy that contradicts the table's layout fails loudly") {
    val base = Files.createTempDirectory("graft_w7").toString + "/t"
    rowsDf(30).write.format("graft").partitionBy("day").save(base)
    // Delta's partitioning-mismatch contract: never silently write the
    // hinted layout under the old one
    val err = intercept[Exception] {
      rowsDf(3).write.format("graft").mode("append")
        .option(WriteIntoGraft.PartitionColOption, "value").save(base)
    }
    assert(err.getMessage.contains("partitioned by 'day'"))
    // matching hint is accepted
    rowsDf(3).write.format("graft").mode("append")
      .option(WriteIntoGraft.PartitionColOption, "DAY").save(base)
    assert(readT(base).count() == 33)
  }

  test("mergeSchema: unknown columns reject without it, widen with it") {
    val base = Files.createTempDirectory("graft_w8").toString + "/t"
    rowsDf(30).write.format("graft").partitionBy("day").save(base)
    val widened = rowsDf(6).withColumn("note", lit("late"))
    // schema enforcement: extras without the opt-in fail loudly
    val err = intercept[Exception] {
      widened.write.format("graft").mode("append").save(base)
    }
    assert(err.getMessage.contains("mergeSchema"))
    assert(readT(base).columns.toSeq == Seq("id", "value", "day"))
    // Delta's per-write spelling widens the schema
    widened.write.format("graft").mode("append")
      .option(WriteIntoGraft.MergeSchemaOption, "true").save(base)
    val t = readT(base)
    assert(t.columns.toSeq == Seq("id", "value", "day", "note"))
    assert(t.filter(col("note") === "late").count() == 6)
    assert(t.filter(col("note").isNull).count() == 30,
      "pre-evolution rows backfill NULL")
    // replaceWhere + mergeSchema: new column committed, region replaced
    val repl = rowsDf(9).filter(col("day") === "d1")
      .withColumn("flag", lit(7L))
    repl.write.format("graft").mode("overwrite")
      .option("replaceWhere", "day = 'd1'")
      .option(WriteIntoGraft.MergeSchemaOption, "true").save(base)
    val t2 = readT(base)
    assert(t2.columns.contains("flag"))
    assert(t2.filter(col("day") === "d1").count() == 3)
    assert(t2.filter(col("flag").isNotNull).count() == 3)
  }

  test("txnAppId/txnVersion: replayed format appends are no-ops") {
    val base = Files.createTempDirectory("graft_w10").toString + "/t"
    rowsDf(30).write.format("graft").partitionBy("day").save(base)
    def appendTxn(v: Int, shift: Long): Unit =
      rowsDf(10).withColumn("id", col("id") + shift)
        .write.format("graft").mode("append")
        .option(WriteIntoGraft.TxnAppIdOption, "job_w10")
        .option(WriteIntoGraft.TxnVersionOption, v.toString)
        .save(base)
    appendTxn(1, 100)
    assert(readT(base).count() == 40)
    // the crashed-and-rerun batch: same (appId, version) — a no-op,
    // even with different data
    appendTxn(1, 900)
    assert(readT(base).count() == 40, "a replayed txn version must no-op")
    appendTxn(2, 200)
    assert(readT(base).count() == 50)
    // half-set options fail loudly
    val err = intercept[Exception] {
      rowsDf(1).write.format("graft").mode("append")
        .option(WriteIntoGraft.TxnAppIdOption, "job_w10").save(base)
    }
    assert(err.getMessage.contains("together"))
  }

  test("batch readChangeFeed: ranged CDF through the format options") {
    val base = Files.createTempDirectory("graft_w11").toString + "/t"
    rowsDf(30).write.format("graft").partitionBy("day").save(base)
    SnapshotLog.setProperties(s, base, Map(SnapshotLog.CdfProp -> "true"))
    rowsDf(10).withColumn("id", col("id") + 100)
      .write.format("graft").mode("append").save(base)       // v3, 10 inserts
    SnapshotLog.deleteWhere(s, base, col("id") > 105, "day") // v4, 5 deletes
    def feed(opts: (String, String)*): org.apache.spark.sql.DataFrame = {
      val r = s.read.format("graft").option("readChangeFeed", "true")
      opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load(base)
    }
    // whole materialized feed (CDF enabled late: starts at v3)
    val all = feed()
    assert(all.columns.takeRight(2).toSeq ==
      Seq("change_type", "_commit_version"))
    assert(all.filter(col("change_type") === "insert").count() == 10)
    assert(all.filter(col("change_type") === "delete").count() == 5)
    // ranged: only the delete commit
    val v4 = feed("startingVersion" -> "4")
    assert(v4.count() == 5 &&
      v4.filter(col("change_type") =!= "delete").count() == 0)
    assert(feed("startingVersion" -> "3", "endingVersion" -> "3").count() == 10)
    // an explicit range over pre-CDF commits fails loudly, never
    // under-delivers
    val gap = intercept[Exception] { feed("startingVersion" -> "1").collect() }
    assert(gap.getMessage.contains("no materialized change feed"))
    // composes with SQL over a temp view
    feed("startingVersion" -> "3").createOrReplaceTempView("w11_cdf")
    assert(s.sql("SELECT COUNT(DISTINCT _commit_version) FROM w11_cdf")
      .head.getLong(0) == 2)
  }

  test("staged CTAS: abort before commit leaves NOTHING committed") {
    import org.apache.spark.sql.connector.expressions.Expressions
    val base = Files.createTempDirectory("graft_w9").toString + "/t"
    val staged = new GraftStagedTable(s, base, rowsDf(1).schema,
      Array(Expressions.identity("day")), Map.empty,
      replaceExisting = false)
    // drive the V1 write the exec would: insert captures, nothing commits
    val info = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def options() =
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.emptyMap())
      override def queryId(): String = "w9"
      override def schema() = rowsDf(1).schema
    }
    staged.newWriteBuilder(info).build()
      .asInstanceOf[org.apache.spark.sql.connector.write.V1Write]
      .toInsertableRelation.insert(rowsDf(30), overwrite = false)
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(SnapshotLog.readManifest(fs, bp).isEmpty,
      "insert() must not commit — the data job is deferred to commitStagedChanges")
    staged.abortStagedChanges()
    assert(SnapshotLog.readManifest(fs, bp).isEmpty,
      "an aborted CTAS leaves no committed version")
    intercept[Exception] { staged.commitStagedChanges() }
    // a fresh staging commits normally, data job included
    val staged2 = new GraftStagedTable(s, base, rowsDf(1).schema,
      Array(Expressions.identity("day")), Map.empty,
      replaceExisting = false)
    staged2.newWriteBuilder(info).build()
      .asInstanceOf[org.apache.spark.sql.connector.write.V1Write]
      .toInsertableRelation.insert(rowsDf(30), overwrite = false)
    staged2.commitStagedChanges()
    assert(readT(base).count() == 30)
  }

  test("CREATE TABLE / CTAS / INSERT INTO / INSERT OVERWRITE through the catalog") {
    val root = Files.createTempDirectory("graft_wcat").toString
    s.conf.set("spark.sql.catalog.graft_w", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_w.root", root)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_w.db")

    // plain CREATE: empty v1 manifest, schema + partition col recorded
    s.sql("""CREATE TABLE graft_w.db.t1 (id BIGINT, value DOUBLE, day STRING)
             USING graft PARTITIONED BY (day)""")
    val m1 = manifest(s"$root/db/t1")
    assert(m1.version == 1L && m1.files.isEmpty)
    assert(m1.props.get(SnapshotLog.PartColProp).contains("day"))
    assert(m1.schema.get.fieldNames.toSeq == Seq("id", "value", "day"))
    assert(s.sql("SELECT * FROM graft_w.db.t1").count() == 0)

    // creating it again must fail
    intercept[Exception] {
      s.sql("CREATE TABLE graft_w.db.t1 (id BIGINT) USING graft")
    }

    // INSERT INTO (by position, casts applied)
    rowsDf(30).createOrReplaceTempView("w_src")
    s.sql("INSERT INTO graft_w.db.t1 SELECT id, value, day FROM w_src")
    assert(s.sql("SELECT COUNT(*) FROM graft_w.db.t1").head.getLong(0) == 30)
    s.sql("INSERT INTO graft_w.db.t1 SELECT id + 100, value, day FROM w_src")
    assert(s.sql("SELECT COUNT(*) FROM graft_w.db.t1").head.getLong(0) == 60)

    // INSERT OVERWRITE replaces the snapshot
    s.sql("INSERT OVERWRITE graft_w.db.t1 SELECT id, value, day FROM w_src")
    assert(s.sql("SELECT COUNT(*) FROM graft_w.db.t1").head.getLong(0) == 30)

    // CTAS: create + data in one statement
    s.sql("""CREATE TABLE graft_w.db.t2 USING graft PARTITIONED BY (day)
             AS SELECT id, value, day FROM w_src WHERE day <> 'd2'""")
    assert(s.sql("SELECT COUNT(*) FROM graft_w.db.t2").head.getLong(0) == 20)
    assert(manifest(s"$root/db/t2").props
      .get(SnapshotLog.PartColProp).contains("day"))
    assert(s.sql("SHOW TABLES IN graft_w.db").collect()
      .map(_.getString(1)).toSet == Set("t1", "t2"))

    // DROP TABLE removes the directory (managed semantics)
    s.sql("DROP TABLE graft_w.db.t2")
    assert(!new java.io.File(s"$root/db/t2").exists())
    assert(s.sql("SHOW TABLES IN graft_w.db").collect()
      .map(_.getString(1)).toSet == Set("t1"))
  }

  test("concurrent format appends: optimistic commits, no lost batch") {
    val base = Files.createTempDirectory("graft_wconc").toString + "/t"
    rowsDf(30).write.format("graft").partitionBy("day").save(base)
    // racing appenders through the DSv2 surface — every batch must
    // land exactly once (the commit loop retries lost races)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = (1 to 4).map { i =>
      Future {
        rowsDf(30).withColumn("id", col("id") + i * 1000)
          .write.format("graft").mode("append").save(base)
      }
    }
    Await.result(Future.sequence(writes), 120.seconds)
    val t = readT(base)
    assert(t.count() == 150, "30 initial + 4 racing appends of 30")
    assert(t.select(col("id")).distinct().count() == 150,
      "no batch landed twice")
  }

  test("dynamic partition overwrite replaces ONLY the batch's partitions") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_wdpo").toString + "/t"
    rowsDf(90).write.format("graft").partitionBy("day").save(base)
    val before = manifest(base)

    // dynamic: a batch touching only d1 replaces only d1
    val d1 = (1L to 10L).map(i => (i + 1000L, 0.5, "d1")).toDF("id", "value", "day")
    d1.write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(base)
    val after = manifest(base)
    assert(after.files.view.filterKeys(_ != "d1").toMap ==
      before.files.view.filterKeys(_ != "d1").toMap,
      "untouched partitions must keep their exact file lists")
    val t = readT(base)
    assert(t.filter(col("day") === "d1").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq == (1001L to 1010L))
    assert(t.filter(col("day") =!= "d1").count() == 60)

    // session-conf spelling, no option
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val d2 = Seq((2000L, 9.9, "d2")).toDF("id", "value", "day")
      d2.write.format("graft").mode("overwrite").save(base)
      assert(readT(base).filter(col("day") === "d2").count() == 1)
      assert(readT(base).filter(col("day") === "d0").count() == 30,
        "conf-driven dynamic overwrite must not touch other partitions")
    } finally s.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

    // static (default) replaces the WHOLE table
    d1.write.format("graft").mode("overwrite").save(base)
    assert(readT(base).count() == 10)

    // junk spelling refuses
    intercept[Exception] {
      d1.write.format("graft").mode("overwrite")
        .option("partitionOverwriteMode", "sideways").save(base)
    }
    // replaceWhere + dynamic cannot combine
    intercept[Exception] {
      d1.write.format("graft").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("replaceWhere", "day = 'd1'").save(base)
    }
  }

  test("replaceWhere wins over session-level dynamic; txn composes with dynamic") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_wdpo3").toString + "/t"
    rowsDf(90).write.format("graft").partitionBy("day").save(base)

    // session-wide dynamic must NOT hard-fail an explicit replaceWhere
    // (upstream precedence: the predicate already scopes the replace) —
    // only the per-write option=dynamic combination is a contradiction
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val repl = (1L to 5L).map(i => (i + 3000L, -1.0, "d0"))
        .toDF("id", "value", "day")
      repl.write.format("graft").mode("overwrite")
        .option("replaceWhere", "day = 'd0'").save(base)
      val t = readT(base)
      assert(t.filter(col("day") === "d0").count() == 5,
        "replaceWhere executed under session-level dynamic")
      assert(t.count() == 65)
    } finally s.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

    // idempotent-writer tokens compose with dynamic overwrite: the
    // standard guard for a retried foreachBatch backfill
    val d1 = (1L to 10L).map(i => (i + 5000L, 0.5, "d1")).toDF("id", "value", "day")
    d1.write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("txnAppId", "backfill").option("txnVersion", "7").save(base)
    assert(readT(base).filter(col("day") === "d1").count() == 10)
    val vAfter = manifest(base).version
    // the replay: same (appId, version) — must no-op, not replace again
    val d1b = (1L to 3L).map(i => (i + 9000L, 9.9, "d1")).toDF("id", "value", "day")
    d1b.write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("txnAppId", "backfill").option("txnVersion", "7").save(base)
    assert(manifest(base).version == vAfter, "replayed txn no-ops")
    assert(readT(base).filter(col("day") === "d1").select("id")
      .collect().map(_.getLong(0)).min == 5001L)
    // a NEW txn version executes
    d1b.write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("txnAppId", "backfill").option("txnVersion", "8").save(base)
    assert(readT(base).filter(col("day") === "d1").count() == 3)
  }

  test("dynamic overwrite on an unpartitioned table = full overwrite") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_wdpo2").toString + "/t"
    (1L to 50L).map(i => (i, s"x$i")).toDF("id", "s")
      .write.format("graft").save(base)
    Seq((99L, "y")).toDF("id", "s")
      .write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(base)
    assert(readT(base).count() == 1, "no partitions to scope — Spark's " +
      "dynamic mode degenerates to a full overwrite")
  }

  test("ALTER TABLE through the catalog: properties, add/rename/drop column") {
    val root = Files.createTempDirectory("graft_walter").toString
    s.conf.set("spark.sql.catalog.graft_wa", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_wa.root", root)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_wa.db")
    rowsDf(30).createOrReplaceTempView("wa_src")
    s.sql("""CREATE TABLE graft_wa.db.t USING graft PARTITIONED BY (day)
             AS SELECT id, value, day FROM wa_src""")
    val base = s"$root/db/t"

    s.sql("ALTER TABLE graft_wa.db.t SET TBLPROPERTIES ('owner.team' = 'etl')")
    assert(manifest(base).props.get("owner.team").contains("etl"))
    s.sql("ALTER TABLE graft_wa.db.t UNSET TBLPROPERTIES ('owner.team')")
    assert(!manifest(base).props.contains("owner.team"))

    // ADD COLUMNS: metadata-only, existing rows read NULL
    s.sql("ALTER TABLE graft_wa.db.t ADD COLUMNS (note STRING)")
    val withNote = s.sql("SELECT * FROM graft_wa.db.t")
    assert(withNote.columns.toSeq == Seq("id", "value", "day", "note"))
    assert(withNote.filter(col("note").isNotNull).count() == 0)

    // RENAME COLUMN: column mapping, zero files rewritten
    val filesBefore = manifest(base).allFiles.toSet
    s.sql("ALTER TABLE graft_wa.db.t RENAME COLUMN value TO amount")
    assert(manifest(base).allFiles.toSet == filesBefore,
      "a rename must not rewrite data files")
    assert(s.sql("SELECT SUM(amount) FROM graft_wa.db.t").head.getDouble(0) > 0)

    // DROP COLUMN: tombstone; the column disappears from reads
    s.sql("ALTER TABLE graft_wa.db.t DROP COLUMN note")
    assert(s.sql("SELECT * FROM graft_wa.db.t").columns.toSeq ==
      Seq("id", "amount", "day"))

    // SQL row-level DML on the THREE-PART catalog name: routed through
    // the same commit-log writers as the registered views
    s.sql("DELETE FROM graft_wa.db.t WHERE id % 2 = 0")
    assert(s.sql("SELECT COUNT(*) FROM graft_wa.db.t").head.getLong(0) == 15)
    s.sql("UPDATE graft_wa.db.t SET amount = amount * 0 WHERE id = 1")
    assert(s.sql(
      "SELECT COUNT(*) FROM graft_wa.db.t WHERE amount = 0").head.getLong(0) == 1)
    s.sql("""MERGE INTO graft_wa.db.t t USING
               (SELECT id, value AS amount, day FROM wa_src WHERE id <= 4) s
             ON t.id = s.id
             WHEN MATCHED THEN UPDATE SET *
             WHEN NOT MATCHED THEN INSERT *""")
    assert(s.sql("SELECT COUNT(*) FROM graft_wa.db.t").head.getLong(0) == 17,
      "MERGE upserts through the catalog name (2 updates, 2 inserts)")

    // CREATE OR REPLACE TABLE: ATOMIC (StagingTableCatalog) — one
    // overwrite commit, no drop-then-recreate window, history preserved
    val vPreReplace = manifest(base).version
    s.sql("""CREATE OR REPLACE TABLE graft_wa.db.t USING graft
             PARTITIONED BY (day)
             AS SELECT id, value, day FROM wa_src WHERE id <= 5""")
    assert(s.sql("SELECT COUNT(*) FROM graft_wa.db.t").head.getLong(0) == 5)
    assert(manifest(base).version > vPreReplace,
      "REPLACE commits a new version instead of erasing the directory")
    assert(s.sql(
      s"SELECT COUNT(*) FROM graft_wa.db.t VERSION AS OF $vPreReplace")
      .head.getLong(0) == 17,
      "time travel reaches back across a REPLACE")

    // maintenance verbs on the DOTTED name: OPTIMIZE / DESCRIBE
    // HISTORY / DESCRIBE DETAIL / SHOW PARTITIONS / VACUUM / RESTORE
    assert(s.sql("DESCRIBE HISTORY graft_wa.db.t").count() >= 2)
    val det = s.sql("DESCRIBE DETAIL graft_wa.db.t").collect().head
    assert(det.getAs[String]("partition_col") == "day")
    assert(s.sql("SHOW PARTITIONS graft_wa.db.t").count() > 0)
    s.sql("OPTIMIZE graft_wa.db.t")
    assert(s.sql("VACUUM graft_wa.db.t DRY RUN").count() == 1)
    // restore to an EXPLICIT version (the 17-row pre-replace snapshot):
    // vNow-1 was only the replace version while OPTIMIZE always
    // committed a fold; since r16's staged-write rebalance the replace
    // lands one file per partition and OPTIMIZE can legitimately no-op
    val vNow = manifest(base).version
    s.sql(s"RESTORE TABLE graft_wa.db.t TO VERSION AS OF $vPreReplace")
    assert(manifest(base).version == vNow + 1,
      "RESTORE on the dotted name commits a rollback version")
    assert(s.sql("SELECT COUNT(*) FROM graft_wa.db.t").head.getLong(0) == 17,
      "restore reinstates the pre-replace snapshot")

    // TRUNCATE: one metadata commit, schema/props/history survive
    val vBefore = manifest(base).version
    s.sql("TRUNCATE TABLE graft_wa.db.t")
    assert(s.sql("SELECT COUNT(*) FROM graft_wa.db.t").head.getLong(0) == 0)
    val mT = manifest(base)
    assert(mT.files.isEmpty && mT.schema.isDefined &&
      mT.props.get(SnapshotLog.PartColProp).contains("day"))
    assert(mT.version == vBefore + 1, "TRUNCATE is one versioned commit")
    assert(s.sql(s"SELECT COUNT(*) FROM graft_wa.db.t VERSION AS OF $vBefore")
      .head.getLong(0) == 17, "history survives a TRUNCATE")
  }
}
