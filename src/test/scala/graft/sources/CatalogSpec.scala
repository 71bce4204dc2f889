package graft.sources

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.{FixtureGen, Pipeline}

/** S6 catalog surface: the Glue-crawler model (ref
  * `infrastructure/main.tf:147-179`) as `spark.catalog` registration —
  * crawl a warehouse root, query every table BY NAME through SQL,
  * recover the whole catalog from the data layout alone (the reference
  * re-runs its crawler on every pipeline trigger, `main.tf:364-371`). */
class CatalogSpec extends SparkSpec {

  private val clock = Timestamp.from(Instant.parse("2026-01-01T00:00:00Z"))

  // a real medallion warehouse: pipeline output (partitioned silver + 3 gold)
  private lazy val outRoot: String = {
    val in = Files.createTempDirectory("graft_cat_in").toString
    val out = Files.createTempDirectory("graft_cat_out").toString
    FixtureGen.write(in, nAtms = 20, nTx = 2000, seed = 7L, clock = clock)
    Pipeline.run(spark, in, out, clock)
    out
  }

  test("crawl registers one table per prefix; tables query by name via SQL") {
    val tables = Catalog.crawl(spark, outRoot, "logicash")
    assert(tables.toSet == Set(
      "logicash.gold_atm_ranking", "logicash.gold_daily_balance",
      "logicash.gold_dim_atms", "logicash.silver"),
      s"crawled: $tables")
    // catalog API sees them (temp views from other suites are session-wide
    // and show up in listTables — real tables are the non-temporary ones)
    val listed = spark.catalog.listTables("logicash").collect()
      .filterNot(_.isTemporary).map(_.name).toSet
    assert(listed == Set("gold_atm_ranking", "gold_daily_balance", "gold_dim_atms", "silver"))
    // SQL by name == direct path read
    val byName = spark.sql(
      "SELECT id_atm, dinero_total_movido FROM logicash.gold_atm_ranking")
    val byPath = spark.read.parquet(s"$outRoot/gold_atm_ranking")
      .select("id_atm", "dinero_total_movido")
    assert(byName.except(byPath).isEmpty && byPath.except(byName).isEmpty)
    // cross-table SQL joins work on names alone
    val joined = spark.sql("""
      SELECT g.id_atm, g.dinero_total_movido, d.modelo
      FROM logicash.gold_atm_ranking g
      JOIN logicash.gold_dim_atms d USING (id_atm)""")
    assert(joined.count() == byName.count())
  }

  test("partitioned silver keeps partition pruning through the name-based read") {
    Catalog.crawl(spark, outRoot, "logicash")
    val silver = spark.table("logicash.silver")
    // partition column discovered from the layout
    assert(silver.schema.fieldNames.contains("fecha_dia"))
    val days = silver.select("fecha_dia").distinct().limit(1).collect()
    val day = days.head.getDate(0)
    val one = spark.sql(
      s"SELECT COUNT(*) AS n FROM logicash.silver WHERE fecha_dia = DATE'$day'")
    assert(one.collect().head.getLong(0) > 0)
    // pruning: the scan must read only the matching partition directory
    val scan = spark.sql(
      s"SELECT * FROM logicash.silver WHERE fecha_dia = DATE'$day'")
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || scan.contains("partitionFilters"),
      s"expected partition filters in the plan:\n$scan")
  }

  test("catalog recovers from the data layout alone (crawler restart model)") {
    Catalog.crawl(spark, outRoot, "logicash")
    val before = spark.sql(
      "SELECT COUNT(*) AS n FROM logicash.silver").collect().head.getLong(0)
    // simulate losing the session catalog (what a restart does to the
    // in-memory catalog): drop every definition, data stays on disk
    spark.sql("DROP DATABASE logicash CASCADE")
    assert(!spark.catalog.databaseExists("logicash"))
    // one crawl re-materializes everything from the warehouse dir
    val again = Catalog.crawl(spark, outRoot, "logicash")
    assert(again.size == 4)
    val after = spark.sql(
      "SELECT COUNT(*) AS n FROM logicash.silver").collect().head.getLong(0)
    assert(after == before && after > 0)
  }

  test("re-crawl follows on-disk schema drift (UPDATE_IN_DATABASE)") {
    val root = Files.createTempDirectory("graft_cat_evo").toString
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$root/items")
    Catalog.crawl(spark, root, "evodb")
    assert(spark.table("evodb.items").schema.fieldNames.toSeq == Seq("id", "name"))
    // the producer adds a column and rewrites; re-crawl refreshes the table
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "score")
      .write.mode("overwrite").parquet(s"$root/items")
    Catalog.crawl(spark, root, "evodb")
    assert(spark.table("evodb.items").schema.fieldNames.toSet ==
      Set("id", "name", "score"))
    assert(spark.sql("SELECT SUM(score) AS s FROM evodb.items")
      .collect().head.getDouble(0) == 30.0)
  }

  test("re-crawl discovers partitions that landed after registration") {
    val root = Files.createTempDirectory("graft_cat_part").toString
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").withColumn("dia", lit("2026-01-01"))
      .write.partitionBy("dia").mode("overwrite").parquet(s"$root/facts")
    Catalog.crawl(spark, root, "incdb")
    val before = spark.sql("SELECT COUNT(*) AS n FROM incdb.facts")
      .collect().head.getLong(0)
    assert(before == 2)
    // a new day lands under the SAME table between crawls (the incremental
    // case): the table definition is unchanged, only partitions grew
    Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "v")
      .withColumn("dia", lit("2026-01-02"))
      .write.partitionBy("dia").mode("append").parquet(s"$root/facts")
    Catalog.crawl(spark, root, "incdb")
    val after = spark.sql("SELECT COUNT(*) AS n FROM incdb.facts")
      .collect().head.getLong(0)
    assert(after == 5, s"re-crawl must surface the new partition (got $after)")
    val newDay = spark.sql(
      "SELECT COUNT(*) AS n FROM incdb.facts WHERE dia = '2026-01-02'")
      .collect().head.getLong(0)
    assert(newDay == 3)
  }

  test("crawl registers commit-log tables by name, pinned at the current version") {
    val root = Files.createTempDirectory("graft_cat_snaplog").toString
    import spark.implicits._
    // a plain parquet table AND a SnapshotLog table under one root
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$root/plain")
    def changes(rows: (Long, Double)*) =
      rows.toDF("user_id", "value").withColumn("day", lit("2026-01-01"))
    SnapshotLog.upsertBatch(spark, s"$root/ledger",
      changes((1L, 10.0), (2L, 20.0)),
      key = "user_id", orderCol = "user_id", partCol = "day", batchId = 1)
    val registered = Catalog.crawl(spark, root, "snapdb")
    assert(registered.toSet == Set("snapdb.plain", "snapdb_ledger"),
      s"crawled: $registered")
    // the commit-log table answers SQL by name with MERGE semantics
    val got = spark.sql("SELECT user_id, value FROM snapdb_ledger")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 10.0), (2L, 20.0)), s"view content wrong: $got")
    // a commit AFTER the crawl stays invisible (pinned snapshot) until
    // a re-crawl re-pins the view at the new current version
    SnapshotLog.upsertBatch(spark, s"$root/ledger", changes((2L, 99.0)),
      key = "user_id", orderCol = "user_id", partCol = "day", batchId = 2)
    val pinned = spark.sql("SELECT value FROM snapdb_ledger WHERE user_id = 2")
      .collect().map(_.getDouble(0)).toSet
    assert(pinned == Set(20.0), "crawled view must stay pinned at its version")
    Catalog.crawl(spark, root, "snapdb")
    val repinned = spark.sql("SELECT value FROM snapdb_ledger WHERE user_id = 2")
      .collect().map(_.getDouble(0)).toSet
    assert(repinned == Set(99.0), "re-crawl must re-pin at the new version")
    // DML through the log composes with the catalog: after a predicate
    // DELETE, a re-crawl surfaces the post-DML state by name
    assert(SnapshotLog.deleteWhere(spark, s"$root/ledger",
      col("user_id") === 1L, "day").get.rewrittenPartitions.nonEmpty)
    Catalog.crawl(spark, root, "snapdb")
    val afterDml = spark.sql("SELECT user_id, value FROM snapdb_ledger")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(afterDml == Set((2L, 99.0)), "re-crawl must surface DML results")
  }

  test("crawl registers stamped tables as SQL-DML targets automatically") {
    val root = Files.createTempDirectory("graft_cat_dml").toString
    import spark.implicits._
    // every write surface stamps PartColProp — a crawl needs no
    // caller-supplied layout to make the table DML-addressable
    val s = graft.GraftSessions.withExtensions(spark)
    (1L to 30L).map(i => (i, s"d${i % 3}")).toDF("id", "day")
      .write.format("graft").partitionBy("day").save(s"$root/t")
    Catalog.crawl(s, root, "dmldb")
    s.sql("DELETE FROM dmldb_t WHERE id % 2 = 0")
    assert(s.sql("SELECT COUNT(*) FROM dmldb_t").head.getLong(0) == 15,
      "crawled table takes SQL DML with zero registration calls")
  }

  test("SQL WHERE on a crawled commit-log table prunes files from the manifest") {
    val root = Files.createTempDirectory("graft_cat_prune").toString
    import spark.implicits._
    val rows = (0 until 900).map(i => (i.toLong, i.toDouble, s"d${i % 3}"))
    SnapshotLog.upsertBatch(spark, s"$root/metered",
      rows.toDF("id", "value", "day"), Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Seq("value"),
      clusterBy = Seq("value"), clusterFiles = 4, opCol = None,
      writeCdf = false)
    Catalog.crawl(spark, root, "prunedb")
    val q = spark.sql(
      "SELECT id FROM prunedb_metered WHERE value >= 100.0 AND value < 200.0")
    assert(q.collect().map(_.getLong(0)).toSet == (100L until 200L).toSet)
    val idx = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location
    }.collectFirst { case i: SnapshotFileIndex => i }
    assert(idx.isDefined, "crawled view must plan through SnapshotFileIndex")
    val (sel, tot) = idx.get.lastPruned.get
    assert(sel < tot, s"name-based SQL filter pruned nothing ($sel/$tot)")
  }

  test("saveAsTable managed round-trip (warehouse COPY leg)") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val name = Catalog.saveManaged(df, "staging", "fact_mini")
    assert(name == "staging.fact_mini")
    assert(spark.catalog.tableExists("staging.fact_mini"))
    assert(spark.sql("SELECT COUNT(*) AS n FROM staging.fact_mini")
      .collect().head.getLong(0) == 3)
    // overwrite = full refresh (TRUNCATE+COPY semantics)
    Catalog.saveManaged(df.filter($"k" > 1L), "staging", "fact_mini")
    assert(spark.sql("SELECT COUNT(*) AS n FROM staging.fact_mini")
      .collect().head.getLong(0) == 2)
  }
}
