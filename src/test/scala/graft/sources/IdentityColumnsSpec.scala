package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}

/** IDENTITY columns (`graft.identity.<col> = start:step`, Delta's
  * GENERATED ALWAYS AS IDENTITY): append paths allocate missing/NULL
  * values monotonically above a manifest high-water mark committed
  * atomically with the data; provided values reject (ALWAYS); merge
  * paths allocate only NULL slots; racing writers never collide —
  * the loser re-reads the winner's high-water and re-stages. */
class IdentityColumnsSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  private def mk(name: String, spec: String = "1:1"): (String, String) = {
    val base = Files.createTempDirectory(s"graft_ident_$name").toString + "/tbl"
    s.sql(s"""
      CREATE TABLE ident.$name (id BIGINT, k BIGINT, day STRING)
      USING graft_snapshot PARTITIONED BY (day) LOCATION '$base'
    """)
    s.sql(s"ALTER TABLE ident_$name SET TBLPROPERTIES " +
      s"('${SnapshotLog.IdentityPrefix}id' = '$spec')")
    (base, s"ident_$name")
  }

  private def hw(base: String): Option[Long] = {
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    SnapshotLog.readManifest(fs, bp).get.props
      .get(SnapshotLog.IdentityHighWaterPrefix + "id").map(_.toLong)
  }

  test("INSERT without the column allocates contiguous ids; next batch continues") {
    import s.implicits._
    val (base, v) = mk("alloc")
    (1L to 50L).map(i => (i, s"d${i % 3}")).toDF("k", "day")
      .createOrReplaceTempView("ident_src")
    s.sql(s"INSERT INTO $v (k, day) SELECT * FROM ident_src")
    val ids1 = s.sql(s"SELECT id FROM $v").collect().map(_.getLong(0)).sorted
    assert(ids1.toSeq == (1L to 50L), s"first batch must take 1..50: ${ids1.toSeq}")
    assert(hw(base).contains(50L))
    s.sql(s"INSERT INTO $v (k, day) VALUES (100, 'd0'), (101, 'd1')")
    val ids2 = s.sql(s"SELECT id FROM $v").collect().map(_.getLong(0)).sorted
    assert(ids2.toSeq == (1L to 52L), s"second batch continues: ${ids2.toSeq}")
    assert(hw(base).contains(52L))
  }

  test("GENERATED ALWAYS: a provided id rejects the append; start/step respected") {
    val (base, v) = mk("always", spec = "100:10")
    intercept[Exception] {
      s.sql(s"INSERT INTO $v VALUES (7, 1, 'd0')")
    }
    s.sql(s"INSERT INTO $v (k, day) VALUES (1, 'd0'), (2, 'd1'), (3, 'd2')")
    val ids = s.sql(s"SELECT id FROM $v").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(100L, 110L, 120L), ids.toSeq.toString)
    assert(hw(base).contains(120L))
  }

  test("MERGE: insert arms allocate, update arms keep the table's id") {
    import s.implicits._
    val (base, v) = mk("merge")
    s.sql(s"INSERT INTO $v (k, day) VALUES (10, 'd0'), (20, 'd1')")
    val idOf20 = s.sql(s"SELECT id FROM $v WHERE k = 20").head.getLong(0)
    Seq((20L, "d1"), (30L, "d2")).toDF("k", "day")
      .createOrReplaceTempView("ident_msrc")
    s.sql(s"""
      MERGE INTO $v t USING ident_msrc s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET day = s.day
      WHEN NOT MATCHED THEN INSERT *
    """)
    val rows = s.sql(s"SELECT k, id FROM $v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(20L) == idOf20, "update arm must keep the existing id")
    assert(rows(30L) == 3L, s"insert arm must allocate the next id: $rows")
    assert(rows.values.toSeq.distinct.size == 3, s"ids unique: $rows")
  }

  test("racing writers: ids never collide, high-water accounts for every row") {
    import s.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val (base, v) = mk("race")
    val writers = (1 to 4).map { w =>
      Future {
        val df = (1L to 25L).map(i => (w * 1000L + i, s"d${i % 2}"))
          .toDF("k", "day")
        SnapshotLog.appendBatch(s, base, df, "day", batchId = 100L + w,
          maxRetries = 20)
      }
    }
    Await.result(Future.sequence(writers), 120.seconds)
    // read the table directly — the registered view stays pinned at
    // the pre-race version (Scala-API appends don't repin)
    val ids = SnapshotLog.read(s, base).get
      .select(col("id")).collect().map(_.getLong(0))
    assert(ids.length == 100 && ids.distinct.length == 100,
      s"4 racing writers x 25 rows must allocate 100 distinct ids")
    assert(ids.sorted.toSeq == (1L to 100L),
      "contiguous despite races: each loser re-stages above the winner")
    assert(hw(base).contains(100L))
  }

  test("Delta-style column DDL: IDENTITY + GENERATED ALWAYS AS in CREATE TABLE") {
    val base = Files.createTempDirectory("graft_ident_ddl").toString + "/tbl"
    s.sql(s"""
      CREATE TABLE ident.ddl (
        id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 5),
        k BIGINT,
        day STRING GENERATED ALWAYS AS (CONCAT('d', CAST(k % 2 AS STRING))))
      USING graft_snapshot PARTITIONED BY (day) LOCATION '$base'
    """)
    // both declarations landed as v1 properties
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val m = SnapshotLog.readManifest(fs, bp).get
    assert(m.props(SnapshotLog.IdentityPrefix + "id") == "10:5")
    assert(m.props(SnapshotLog.GenColPrefix + "day")
      .contains("CONCAT"), m.props.toString)
    // one insert exercises BOTH: id allocates 10,15; day computes
    s.sql("INSERT INTO ident_ddl (k) VALUES (4), (7)")
    val rows = s.sql("SELECT id, k, day FROM ident_ddl ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.map(_._1).toSeq == Seq(10L, 15L), rows.toSeq.toString)
    assert(rows.forall { case (_, k, d) => d == s"d${k % 2}" }, rows.toSeq.toString)
    // explicit id refuses (ALWAYS, not BY DEFAULT)
    intercept[Exception] { s.sql("INSERT INTO ident_ddl VALUES (99, 1, 'd1')") }
  }

  test("GENERATED BY DEFAULT AS IDENTITY accepts explicit values, allocates NULLs") {
    val base = Files.createTempDirectory("graft_ident_bd").toString + "/tbl"
    s.sql(s"""
      CREATE TABLE ident.bydef (
        id BIGINT GENERATED BY DEFAULT AS IDENTITY,
        k BIGINT, day STRING)
      USING graft_snapshot PARTITIONED BY (day) LOCATION '$base'
    """)
    s.sql("INSERT INTO ident_bydef VALUES (500, 1, 'd0')")
    s.sql("INSERT INTO ident_bydef (k, day) VALUES (2, 'd1')")
    val ids = s.sql("SELECT id FROM ident_bydef ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 500L), s"explicit 500 kept, NULL slot allocated 1: $ids")
  }

  test("guards: late declaration, rename, and drop refuse") {
    val (base, v) = mk("guard")
    s.sql(s"INSERT INTO $v (k, day) VALUES (1, 'd0')")
    val e = intercept[Exception] {
      s.sql(s"ALTER TABLE $v SET TBLPROPERTIES " +
        s"('${SnapshotLog.IdentityPrefix}k' = '1:1')")
    }
    assert(e.getMessage.contains("IDENTITY"), e.getMessage)
    val er = intercept[Exception] {
      s.sql(s"ALTER TABLE $v RENAME COLUMN id TO ident2")
    }
    assert(er.getMessage.contains("IDENTITY"), er.getMessage)
    val ed = intercept[Exception] { s.sql(s"ALTER TABLE $v DROP COLUMN id") }
    assert(ed.getMessage.contains("IDENTITY"), ed.getMessage)
    // UPDATE of an ALWAYS identity column refuses too
    val eu = intercept[Exception] {
      s.sql(s"UPDATE $v SET id = 999 WHERE k = 1")
    }
    assert(eu.getMessage.contains("IDENTITY"), eu.getMessage)
  }
}
