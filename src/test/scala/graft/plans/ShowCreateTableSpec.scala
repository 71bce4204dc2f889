package graft.plans

import java.nio.file.Files

import graft.{GraftSessions, SparkSpec}
import graft.sources.{Catalog, SnapshotLog}

/** `SHOW CREATE TABLE` on commit-log views: executable DDL answered
  * from the manifest alone. */
class ShowCreateTableSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  test("reconstructs columns, partitioning, properties, and constraints from metadata") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_showcreate").toString + "/tbl"
    val rows = (1L to 10L).map(i => (i, i * 1.0, s"d${i % 2}"))
      .toDF("id", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    val view = Catalog.registerSnapshotLog(s, "showc", "t1", base, Some("day"))
    s.sql(s"ALTER TABLE $view SET TBLPROPERTIES ('graft.owner' = 'etl')")
    s.sql(s"ALTER TABLE $view ADD CONSTRAINT v_pos CHECK (value >= 0)")

    val ddl = s.sql(s"SHOW CREATE TABLE $view").head.getString(0)
    assert(ddl.contains("CREATE TABLE showc_t1 ("))
    assert(ddl.contains("id BIGINT") && ddl.contains("value DOUBLE") &&
      ddl.contains("day STRING"))
    assert(ddl.contains("USING graft_snapshot"))
    assert(ddl.contains("PARTITIONED BY (day)"))
    assert(ddl.contains(s"LOCATION '$base'"))
    assert(ddl.contains("'graft.owner' = 'etl'"))
    assert(ddl.contains("ADD CONSTRAINT v_pos CHECK (value >= 0)"))

    // SHOW CREATE TABLE on an unregistered name keeps Spark's meaning
    intercept[Exception](s.sql("SHOW CREATE TABLE not_a_snapshot"))
  }

  test("ANALYZE FOR ALL COLUMNS records bounds for every bounds-capable column") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_analyzeall").toString + "/tbl"
    val rows = (1L to 50L).map(i => (i, i * 2.0, s"s$i", s"d${i % 2}"))
      .toDF("id", "value", "tag", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    val view = Catalog.registerSnapshotLog(s, "showc", "t2", base, Some("day"))
    s.sql(s"ANALYZE $view COMPUTE STATISTICS FOR ALL COLUMNS")
    val bp = new org.apache.hadoop.fs.Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val m = SnapshotLog.readManifest(fs, bp).get
    val statKeys = m.stats.values.flatMap(_.keys).toSet
    Seq("id", "value", "tag", "day").foreach(c =>
      assert(statKeys.contains(c), s"ALL COLUMNS must cover $c"))
  }
}
