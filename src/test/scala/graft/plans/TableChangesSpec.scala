package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}
import graft.sources.{Catalog, SnapshotLog}

/** `graft_table_changes` — the change-data-feed table function: a
  * FROM-clause relation over the commit-time-materialized feed,
  * version-filtered, resolving registered view names first and raw
  * table paths second; loud errors on a table without a feed. */
class TableChangesSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  test("feed reads by version range, typed rows match the lifecycle") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_tvf").toString + "/tbl"
    val rows = (1L to 100L).map(i => (i, i * 1.0, s"d${i % 2}"))
      .toDF("id", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Seq("id"),
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = true)
    SnapshotLog.upsertBatch(s, base,
      rows.filter(col("id") <= 10).withColumn("value", col("value") + 0.5),
      Seq("id"), "id", "day", batchId = 2, maxRetries = 5,
      statsCols = Seq("id"), clusterBy = Nil, clusterFiles = 2,
      opCol = None, writeCdf = true)
    SnapshotLog.deleteWhere(s, base, col("id") > 90, "day",
      deletionVectors = true, writeCdf = true).get
    val view = Catalog.registerSnapshotLog(s, "tvf", "t1", base, Some("day"))

    // v1 is the initial load: 100 inserts
    assert(s.sql(s"SELECT COUNT(*) FROM graft_table_changes('$view', 1, 1)")
      .head.getLong(0) == 100L)
    // v2: 10 updates → 20 pre/post rows
    val v2 = s.sql(s"SELECT change_type, COUNT(*) AS n FROM " +
      s"graft_table_changes('$view', 2, 2) GROUP BY change_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v2 == Map("update_preimage" -> 10L, "update_postimage" -> 10L))
    // v3: 10 deletes, carrying the deleted values
    val v3 = s.sql(s"SELECT SUM(id) FROM graft_table_changes('$view', 3)" +
      s" WHERE change_type = 'delete'").head.getLong(0)
    assert(v3 == (91L to 100L).sum)

    // a raw PATH works when the name is not registered
    assert(s.sql(s"SELECT COUNT(*) FROM graft_table_changes('$base', 1, 3)")
      .head.getLong(0) == 130L)

    // a table with no materialized feed errors loudly
    val noCdf = Files.createTempDirectory("graft_tvf_nofeed").toString + "/tbl"
    SnapshotLog.upsertBatch(s, noCdf, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Seq("id"),
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    val e = intercept[RuntimeException](
      s.sql(s"SELECT * FROM graft_table_changes('$noCdf', 1)").collect())
    assert(e.getMessage.contains("change feed"))
  }
}
