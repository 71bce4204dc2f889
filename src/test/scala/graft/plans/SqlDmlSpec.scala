package graft.plans

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}
import graft.sources.{Catalog, SnapshotLog}

/** SQL DML on commit-log tables through the extension seam: a plain
  * `spark.sql("DELETE FROM <view> WHERE …")` routes to the commit
  * log's merge-on-read delete (partition predicates still take the
  * metadata fast path), `UPDATE … SET …` to the pruned rewrite, and
  * each statement re-pins the view so the very next SELECT on the
  * same name sees the committed version. */
class SqlDmlSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  test("SQL DELETE: row predicate commits deletion vectors; partition predicate is metadata-only") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_sqldml").toString + "/tbl"
    val rows = (1L to 300L).map(i => (i, i * 1.5, s"d${i % 3}"))
      .toDF("id", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Seq("id"),
      clusterBy = Nil, clusterFiles = 8, opCol = None, writeCdf = false)
    val view = Catalog.registerSnapshotLog(s, "dml", "t1", base, Some("day"))
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val m1 = SnapshotLog.readManifest(fs, bp).get

    // row-predicate DELETE → deletion vectors, zero files rewritten
    val res = s.sql(s"DELETE FROM $view WHERE id % 10 = 3").collect().head
    assert(res.getString(0) == "DELETE" && res.getLong(1) == m1.version + 1)
    val m2 = SnapshotLog.readManifest(fs, bp).get
    assert(m2.files == m1.files, "SQL row delete must commit DVs, not rewrites")
    assert(m2.dvs.values.map(_.count).sum == 30)
    // the SAME view name immediately reads the new snapshot
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 270)
    assert(s.sql(s"SELECT COUNT(*) FROM $view WHERE id % 10 = 3")
      .head.getLong(0) == 0)

    // partition-predicate DELETE → metadata-only drop
    s.sql(s"DELETE FROM $view WHERE day = 'd1'")
    val m3 = SnapshotLog.readManifest(fs, bp).get
    assert(!m3.files.contains("d1") && m3.op.contains("DELETE"))
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) ==
      (1L to 300L).count(i => i % 10 != 3 && i % 3 != 1))

    // SQL UPDATE: assignment evaluated over the old row, re-pinned read
    s.sql(s"UPDATE $view SET value = value * 2 WHERE id = 6")
    assert(s.sql(s"SELECT value FROM $view WHERE id = 6").head.getDouble(0) == 18.0)
    assert(SnapshotLog.readManifest(fs, bp).get.op.contains("UPDATE"))

    // an unregistered name still gets Spark's own v2-only error
    rows.limit(5).createOrReplaceTempView("plain_view")
    intercept[Exception](s.sql("DELETE FROM plain_view WHERE id = 1"))
  }

  test("SQL MERGE INTO: upsert and keyed-delete shapes route to the commit log") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_sqlmerge").toString + "/tbl"
    val rows = (1L to 100L).map(i => (i, i * 1.0, s"d${i % 2}"))
      .toDF("id", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 4, opCol = None, writeCdf = false)
    val view = Catalog.registerSnapshotLog(s, "dml", "t2", base, Some("day"))

    // upsert shape: 2 updates + 1 insert
    Seq((1L, 100.0, "d1"), (2L, 200.0, "d0"), (999L, 9.0, "d1"))
      .toDF("id", "value", "day").createOrReplaceTempView("merge_src")
    val res = s.sql(s"""
      MERGE INTO $view t USING merge_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
    """).collect().head
    assert(res.getString(0) == "MERGE")
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 101)
    assert(s.sql(s"SELECT value FROM $view WHERE id = 1").head.getDouble(0) == 100.0)
    assert(s.sql(s"SELECT value FROM $view WHERE id = 999").head.getDouble(0) == 9.0)
    assert(s.sql(s"SELECT value FROM $view WHERE id = 3").head.getDouble(0) == 3.0)

    // keyed-delete shape: source may carry keys only
    Seq(999L, 50L, 123456L).toDF("id").createOrReplaceTempView("del_src")
    s.sql(s"""
      MERGE INTO $view t USING del_src s ON t.id = s.id
      WHEN MATCHED THEN DELETE
    """)
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 99)
    assert(s.sql(s"SELECT COUNT(*) FROM $view WHERE id IN (999, 50)")
      .head.getLong(0) == 0, "matched keys must delete; absent keys no-op")
  }

  test("conditional MERGE: clause conditions, assignment forms, NOT MATCHED BY SOURCE, row moves") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_sqlmerge2").toString + "/tbl"
    // ids 1..20, value = id, day = d(id%2)
    val rows = (1L to 20L).map(i => (i, i * 1.0, s"st$i", s"d${i % 2}"))
      .toDF("id", "value", "note", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 4, opCol = None, writeCdf = false)
    val view = Catalog.registerSnapshotLog(s, "dml", "t3", base, Some("day"))

    // source: flag D for id 2 (delete), U for 4 & 5 (update, but the
    // t<s condition only passes for 4), id 6 MOVES d0→d9, id 100 is new
    Seq(
      (2L, 0.0, "D", "d0"),
      (4L, 400.0, "U", "d0"),
      (5L, 1.0, "U", "d1"),  // s.value < t.value → update clause false
      (6L, 600.0, "U", "d9"), // partition move d0 → d9
      (100L, 1000.0, "I", "d1"))
      .toDF("id", "value", "flag", "day").createOrReplaceTempView("cond_src")
    s.sql(s"""
      MERGE INTO $view t USING cond_src s ON t.id = s.id
      WHEN MATCHED AND s.flag = 'D' THEN DELETE
      WHEN MATCHED AND t.value < s.value THEN
        UPDATE SET value = s.value, note = concat(t.note, '+'), day = s.day
      WHEN NOT MATCHED AND s.flag <> 'D' THEN
        INSERT (id, value, note, day) VALUES (s.id, s.value, 'new', s.day)
      WHEN NOT MATCHED BY SOURCE AND t.id % 10 = 7 THEN DELETE
    """)
    val out = s.sql(s"SELECT id, value, note, day FROM $view").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2), r.getString(3))))
      .toMap
    assert(!out.contains(2L), "matched+flag=D must delete")
    assert(out(4L) == ((400.0, "st4+", "d0")), "conditional update fires")
    assert(out(5L) == ((5.0, "st5", "d1")), "failed clause condition leaves row")
    assert(out(100L) == ((1000.0, "new", "d1")), "conditional insert with column list")
    assert(!out.contains(7L) && !out.contains(17L), "NMBS conditional delete")
    assert(out.contains(15L), "NMBS rows failing the condition survive")
    // the row move: exactly one id=6 row, in the NEW partition
    assert(out(6L) == ((600.0, "st6+", "d9")), "moved row lands in new partition")
    assert(s.sql(s"SELECT COUNT(*) FROM $view WHERE id = 6").head.getLong(0) == 1,
      "no duplicate row left in the old partition after a move")
    val m = SnapshotLog.readManifest(
      new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration),
      new Path(base)).get
    assert(m.files.contains("d9"), "moved partition exists in manifest")
    // expected count: 20 - 1 (id2) - 2 (7,17 NMBS) + 1 (insert 100) = 18
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 18)

    // duplicate source keys must fail fast, not pick an arbitrary row
    Seq((1L, 10.0, "na", "d1"), (1L, 20.0, "nb", "d1"))
      .toDF("id", "value", "note", "day").createOrReplaceTempView("dup_src")
    val e = intercept[Exception](s.sql(s"""
      MERGE INTO $view t USING dup_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
    """))
    assert(e.getMessage.contains("duplicate"), s"got: ${e.getMessage}")
  }

  test("SQL INSERT INTO / OVERWRITE and CTAS in the commit-log format") {
    import s.implicits._
    val root = Files.createTempDirectory("graft_sqlins").toString
    val base = root + "/tbl"
    val rows = (1L to 10L).map(i => (i, i * 1.0, s"d${i % 2}"))
      .toDF("id", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    val view = Catalog.registerSnapshotLog(s, "dml", "t4", base, Some("day"))
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)

    // bare positional INSERT ... VALUES: appends without touching old files
    val before = SnapshotLog.readManifest(fs, bp).get
    val r1 = s.sql(s"INSERT INTO $view VALUES (11, 11.0, 'd1'), (12, 12.0, 'd2')")
      .collect().head
    assert(r1.getString(0) == "INSERT")
    val m1 = SnapshotLog.readManifest(fs, bp).get
    assert(m1.op.contains("APPEND"))
    assert(before.allFiles.toSet.subsetOf(m1.allFiles.toSet),
      "append must keep every existing file")
    assert(m1.files.contains("d2"), "append creates brand-new partitions")
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 12)

    // column-list INSERT: unnamed columns backfill NULL
    s.sql(s"INSERT INTO $view (id, day) SELECT 13L, 'd0'")
    val got = s.sql(s"SELECT value FROM $view WHERE id = 13").collect()
    assert(got.length == 1 && got.head.isNullAt(0))

    // INSERT INTO ... SELECT from another table
    s.sql(s"INSERT INTO $view SELECT id + 100, value, day FROM $view WHERE id <= 2")
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 15)

    // NULL partition value fails fast
    val e1 = intercept[Exception](
      s.sql(s"INSERT INTO $view VALUES (99, 1.0, NULL)"))
    assert(e1.getMessage.contains("partition column"))

    // INSERT OVERWRITE: full refresh, old files dropped
    s.sql(s"INSERT OVERWRITE $view VALUES (1, 1.0, 'dX')")
    val m2 = SnapshotLog.readManifest(fs, bp).get
    assert(m2.op.contains("OVERWRITE") && m2.files.keySet == Set("dX"))
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 1)

    // CTAS in the engine's own format, registered + DML-able at once
    val loc = root + "/ctas_tbl"
    val r2 = s.sql(s"""
      CREATE TABLE dml.t5 USING graft_snapshot PARTITIONED BY (day)
      LOCATION '$loc' AS SELECT id, value * 10 AS value, day FROM $view
    """).collect().head
    assert(r2.getString(0) == "CTAS")
    assert(s.sql("SELECT value FROM dml_t5").head.getDouble(0) == 10.0)
    s.sql("INSERT INTO dml_t5 VALUES (2, 2.0, 'dY')")
    assert(s.sql("SELECT COUNT(*) FROM dml_t5").head.getLong(0) == 2)
    // second CTAS: plain fails, IF NOT EXISTS no-ops
    intercept[Exception](s.sql(s"""
      CREATE TABLE dml.t5 USING graft_snapshot PARTITIONED BY (day)
      LOCATION '$loc' AS SELECT id, value, day FROM $view
    """))
    val r3 = s.sql(s"""
      CREATE TABLE IF NOT EXISTS dml.t5 USING graft_snapshot
      PARTITIONED BY (day) LOCATION '$loc' AS SELECT id, value, day FROM $view
    """).collect().head
    assert(r3.getString(0) == "CTAS_EXISTS")
    assert(s.sql("SELECT COUNT(*) FROM dml_t5").head.getLong(0) == 2,
      "IF NOT EXISTS must not rewrite the existing table")
  }

  test("time travel SQL: VERSION AS OF and TIMESTAMP AS OF pin historical snapshots") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_sqltt").toString + "/tbl"
    val rows = (1L to 100L).map(i => (i, i * 1.0, s"d${i % 2}"))
      .toDF("id", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Seq("id"),
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    val view = Catalog.registerSnapshotLog(s, "dml", "t6", base, Some("day"))
    s.sql(s"DELETE FROM $view WHERE id % 4 = 0")            // v2
    s.sql(s"UPDATE $view SET value = value + 1000 WHERE id = 1") // v3

    // each pinned version answers with ITS state, in one statement
    val counts = s.sql(s"""
      SELECT v, n FROM (
        SELECT 1 AS v, COUNT(*) AS n FROM $view VERSION AS OF 1
        UNION ALL SELECT 2, COUNT(*) FROM $view VERSION AS OF 2
        UNION ALL SELECT 3, COUNT(*) FROM $view VERSION AS OF 3)
      ORDER BY v
    """).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(1 -> 100L, 2 -> 75L, 3 -> 75L), s"got $counts")
    assert(s.sql(s"SELECT value FROM $view VERSION AS OF 2 WHERE id = 1")
      .head.getDouble(0) == 1.0, "v2 predates the UPDATE")
    assert(s.sql(s"SELECT value FROM $view WHERE id = 1")
      .head.getDouble(0) == 1001.0, "the live view reads the newest commit")
    // a pinned version still prunes via its manifest (stats recorded on id)
    assert(s.sql(s"SELECT COUNT(*) FROM $view VERSION AS OF 1 WHERE id <= 10")
      .head.getLong(0) == 10)

    // TIMESTAMP AS OF: far future resolves to the newest version,
    // prehistory errors
    assert(s.sql(s"SELECT COUNT(*) FROM $view TIMESTAMP AS OF '2100-01-01'")
      .head.getLong(0) == 75)
    val e = intercept[Exception](
      s.sql(s"SELECT COUNT(*) FROM $view TIMESTAMP AS OF '1990-01-01'").collect())
    assert(e.getMessage.contains("no version committed"), s"got: ${e.getMessage}")
    // an unknown version errors loudly
    val e2 = intercept[Exception](
      s.sql(s"SELECT COUNT(*) FROM $view VERSION AS OF 99").collect())
    assert(e2.getMessage.contains("no committed version"), s"got: ${e2.getMessage}")
  }
}
