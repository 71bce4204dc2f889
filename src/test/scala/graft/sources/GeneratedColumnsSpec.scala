package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}

/** GENERATED columns (`graft.generated.<col> = <expr>`, Delta's
  * GENERATED ALWAYS AS): every write path computes the column when the
  * batch lacks it, validates provided non-null values against the
  * expression (all-or-nothing), and UPDATE recomputes generated
  * columns over the post-assignment row — including a generated
  * PARTITION column, whose recompute MOVES the row. */
class GeneratedColumnsSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  private def mk(name: String): (String, Path,
      org.apache.hadoop.fs.FileSystem, String) = {
    import s.implicits._
    val base = Files.createTempDirectory(s"graft_gencol_$name").toString + "/tbl"
    val rows = (1L to 30L).map(i => (i, i * 1.0, s"d${i % 3}"))
      .toDF("id", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    val view = Catalog.registerSnapshotLog(s, "gencol", name, base, Some("day"))
    s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
      s"('${SnapshotLog.GenColPrefix}day' = " +
      "'CONCAT(''d'', CAST(id % 3 AS STRING))')")
    val bp = new Path(base)
    (base, bp, bp.getFileSystem(s.sparkContext.hadoopConfiguration), view)
  }

  test("a write lacking the generated column computes it (and partitions by it)") {
    import s.implicits._
    val (base, bp, fs, view) = mk("compute")
    // Scala-API upsert without `day`
    val batch = Seq((100L, 5.0), (101L, 6.0)).toDF("id", "value")
    SnapshotLog.upsertBatch(s, base, batch, Seq("id"), "id", "day",
      batchId = 2, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    val after = SnapshotLog.read(s, base).get
    assert(after.filter(col("id") === 100L).head.getString(2) == "d1")
    assert(after.filter(col("id") === 101L).head.getString(2) == "d2")
    // SQL INSERT with an explicit column list (day backfills via NULL
    // then computes)
    Catalog.registerSnapshotLog(s, "gencol", "compute", base, Some("day"))
    s.sql(s"INSERT INTO $view (id, value) SELECT 200, 9.0")
    assert(s.sql(s"SELECT day FROM $view WHERE id = 200").head.getString(0)
      == "d2")
  }

  test("a provided value that differs from the expression rejects the batch") {
    import s.implicits._
    val (base, _, _, view) = mk("validate")
    intercept[Exception] {
      s.sql(s"INSERT INTO $view VALUES (300, 1.0, 'd9')")
    }
    // the failed insert must not have committed anything
    assert(s.sql(s"SELECT COUNT(*) FROM $view WHERE id = 300").head.getLong(0) == 0)
    // a CORRECT provided value passes
    s.sql(s"INSERT INTO $view VALUES (300, 1.0, 'd0')")
    assert(s.sql(s"SELECT day FROM $view WHERE id = 300").head.getString(0) == "d0")
  }

  test("UPDATE of a dependency recomputes the generated partition column and moves the row") {
    val (base, bp, fs, view) = mk("move")
    // id 5 lives in d2; SET id = 6 must recompute day -> d0 and move
    s.sql(s"UPDATE $view SET id = 6000 WHERE id = 5")
    val after = SnapshotLog.read(s, base).get
    val row = after.filter(col("id") === 6000L).head
    assert(row.getString(2) == "d0",
      s"generated day must recompute from the NEW id, got ${row.getString(2)}")
    // the row landed in partition d0 and left d2 (no duplicate)
    assert(after.filter(col("id") === 5L).count() == 0)
    val m = SnapshotLog.readManifest(fs, bp).get
    val d0rows = SnapshotLog.readPartitions(s, base, Seq("d0")).get
    assert(d0rows.filter(col("id") === 6000L).count() == 1)
  }

  test("RENAME/DROP COLUMN refuse columns entangled with a generated definition") {
    val (base, _, _, view) = mk("ddlguard")
    // make `value` generated too (non-partition — the partition column
    // has its own earlier guard): value = id * 1.0, which the fixture
    // rows already satisfy
    s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
      s"('${SnapshotLog.GenColPrefix}value' = 'CAST(id AS DOUBLE) * 1.0')")
    // the generated column itself: a stale graft.generated.value
    // property would re-add `value` on the next write into a tainted
    // physical slot, bricking every subsequent INSERT/UPSERT
    val e1 = intercept[Exception] {
      s.sql(s"ALTER TABLE $view RENAME COLUMN value TO amount")
    }
    assert(e1.getMessage.contains("GENERATED"), e1.getMessage)
    val e2 = intercept[Exception] {
      s.sql(s"ALTER TABLE $view DROP COLUMN value")
    }
    assert(e2.getMessage.contains("GENERATED"), e2.getMessage)
    // a DEPENDENCY of an expression (id appears in both definitions):
    // renaming it would break the stored expressions' resolution
    val e3 = intercept[Exception] {
      s.sql(s"ALTER TABLE $view RENAME COLUMN id TO ident")
    }
    assert(e3.getMessage.contains("GENERATED"), e3.getMessage)
    // after UNSET of the properties the DDLs go through
    s.sql(s"ALTER TABLE $view UNSET TBLPROPERTIES " +
      s"('${SnapshotLog.GenColPrefix}value', '${SnapshotLog.GenColPrefix}day')")
    s.sql(s"ALTER TABLE $view RENAME COLUMN value TO amount")
    assert(s.sql(s"SELECT amount FROM $view WHERE id = 1").head.getDouble(0) == 1.0)
    s.sql(s"ALTER TABLE $view RENAME COLUMN id TO ident")
    assert(s.sql(s"SELECT ident FROM $view WHERE ident = 1").count() == 1)
  }

  test("a delete batch LACKING the generated partition column routes from the payload") {
    import s.implicits._
    val (base, _, _, _) = mk("cdcnoday")
    // the batch has no `day` at all: the expression must compute it for
    // the D row too (id 7 -> d1), or the delete would route to the null
    // partition and silently remove nothing
    val cdc = Seq((7L, 0.0, "D"), (500L, 5.0, "U")).toDF("id", "value", "op")
    SnapshotLog.upsertBatch(s, base, cdc, Seq("id"), "id", "day",
      batchId = 3, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 2, opCol = Some("op"), writeCdf = false)
    val after = SnapshotLog.read(s, base).get
    assert(after.filter(col("id") === 7L).count() == 0,
      "the D row must delete its target (computed routing)")
    assert(after.filter(col("id") === 500L).head.getString(2) == "d2")
  }

  test("UPDATE that SETs a generated column explicitly validates against the expression") {
    val (base, _, _, view) = mk("updset")
    // wrong explicit value: refuse (the stored value would break the
    // invariant every insert validates)
    val e = intercept[Exception] {
      s.sql(s"UPDATE $view SET day = 'd9' WHERE id = 4")
    }
    assert(e.getMessage.contains("GENERATED"), e.getMessage)
    assert(s.sql(s"SELECT day FROM $view WHERE id = 4").head.getString(0) == "d1",
      "failed UPDATE must not commit")
    // a correct explicit value passes
    s.sql(s"UPDATE $view SET day = 'd1', value = 9.0 WHERE id = 4")
    assert(s.sql(s"SELECT value FROM $view WHERE id = 4").head.getDouble(0) == 9.0)
  }

  test("MERGE star actions recompute generated columns instead of rejecting stale values") {
    val (base, _, _, view) = mk("mergestar")
    // source carries a STALE day for an existing key and a WRONG day
    // for a new key — SET * / INSERT * must recompute both, not reject
    s.sql("CREATE OR REPLACE TEMP VIEW merge_src AS " +
      "SELECT 2 AS id, 99.0 AS value, 'dSTALE' AS day " +
      "UNION ALL SELECT 600, 6.0, 'dWRONG'")
    s.sql(s"""MERGE INTO $view t USING merge_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(s.sql(s"SELECT day, value FROM $view WHERE id = 2").head.getString(0)
      == "d2", "matched star update must recompute day from the post-image")
    assert(s.sql(s"SELECT value FROM $view WHERE id = 2").head.getDouble(0) == 99.0)
    assert(s.sql(s"SELECT day FROM $view WHERE id = 600").head.getString(0)
      == "d0", "insert star must recompute day")
  }

  test("a writer under a different session timezone refuses once the generation tz is stamped") {
    import s.implicits._
    val (base, bp, fs, _) = mk("tzguard")
    // the first post-declaration write stamps the writer's session tz
    SnapshotLog.upsertBatch(s, base, Seq((400L, 1.0)).toDF("id", "value"),
      Seq("id"), "id", "day", batchId = 2, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    assert(SnapshotLog.readManifest(fs, bp).get
      .props.get(SnapshotLog.GenTzProp).contains("UTC"))
    val before = s.conf.get("spark.sql.session.timeZone")
    try {
      s.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
      // a mismatched writer REFUSES (it would compute generated
      // partition values under a different clock than every existing
      // partition — the write-side mirror of the derivation refusal)
      val e = intercept[Exception] {
        SnapshotLog.upsertBatch(s, base, Seq((401L, 2.0)).toDF("id", "value"),
          Seq("id"), "id", "day", batchId = 3, maxRetries = 5, statsCols = Nil,
          clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
      }
      assert(e.getMessage.contains("timezone"), e.getMessage)
      // UPDATE recomputes generated partition values too — same refusal
      val e2 = intercept[Exception] {
        SnapshotLog.updateWhere(s, base, col("id") === 400L,
          Map("value" -> lit(9.0)), "day")
      }
      assert(e2.getMessage.contains("timezone"), e2.getMessage)
    } finally s.conf.set("spark.sql.session.timeZone", before)
    // back under the stamped tz, writes flow again
    SnapshotLog.upsertBatch(s, base, Seq((401L, 2.0)).toDF("id", "value"),
      Seq("id"), "id", "day", batchId = 4, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    assert(SnapshotLog.read(s, base).get.filter(col("id") === 401L).count() == 1)
  }

  test("CDC delete markers are exempt from generated-column validation") {
    import s.implicits._
    val (base, _, _, _) = mk("cdc")
    // a D row with a garbage payload must pass validation untouched;
    // its day value routes the delete
    val cdc = Seq((3L, -1.0, "d0", "D"), (400L, 4.0, "d1", "U"))
      .toDF("id", "value", "day", "op")
    SnapshotLog.upsertBatch(s, base, cdc, Seq("id"), "id", "day",
      batchId = 3, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 2, opCol = Some("op"), writeCdf = false)
    val after = SnapshotLog.read(s, base).get
    assert(after.filter(col("id") === 3L).count() == 0, "the D row deletes")
    assert(after.filter(col("id") === 400L).head.getString(2) == "d1")
  }
}
