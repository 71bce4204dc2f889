package graft.plans

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}
import graft.sources.{Catalog, SnapshotLog}

/** Empty `CREATE TABLE … USING graft_snapshot` (DDL-first: version 1
  * holds schema and no files) and `CREATE OR REPLACE TABLE … AS`
  * (full-refresh DDL: contents AND schema replaced as a new version
  * in the same history). */
class CreateReplaceTableSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  test("empty CREATE TABLE commits v1 with schema and no files; first INSERT lands on top") {
    val base = Files.createTempDirectory("graft_create_empty").toString + "/tbl"
    s.sql(s"""
      CREATE TABLE crt.t1 (id BIGINT, value DOUBLE, day STRING)
      USING graft_snapshot PARTITIONED BY (day) LOCATION '$base'
    """)
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val m = SnapshotLog.readManifest(fs, bp).get
    assert(m.version == 1L && m.files.isEmpty && m.op.contains("CREATE"))
    assert(m.schema.get.fieldNames.toSeq == Seq("id", "value", "day"))
    // the empty table reads (0 rows, full schema) and accepts DDL
    assert(s.sql("SELECT COUNT(*) FROM crt_t1").head.getLong(0) == 0)
    s.sql("ALTER TABLE crt_t1 ADD CONSTRAINT v_pos CHECK (value >= 0)")

    s.sql("INSERT INTO crt_t1 VALUES (1, 1.5, 'd0'), (2, 2.5, 'd1')")
    assert(s.sql("SELECT COUNT(*) FROM crt_t1").head.getLong(0) == 2)
    intercept[Exception](s.sql("INSERT INTO crt_t1 VALUES (3, -1.0, 'd0')"))

    // plain CREATE on the existing table errors; IF NOT EXISTS no-ops
    intercept[Exception](s.sql(s"""
      CREATE TABLE crt.t1b (id BIGINT, day STRING)
      USING graft_snapshot PARTITIONED BY (day) LOCATION '$base'
    """))
    s.sql(s"""
      CREATE TABLE IF NOT EXISTS crt.t1c (id BIGINT, day STRING)
      USING graft_snapshot PARTITIONED BY (day) LOCATION '$base'
    """)
    assert(s.sql("SELECT COUNT(*) FROM crt_t1c").head.getLong(0) == 2)
  }

  test("CREATE OR REPLACE TABLE AS replaces contents and schema in the same history") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_replace").toString + "/tbl"
    (1L to 20L).map(i => (i, i * 1.0, s"d${i % 2}")).toDF("id", "value", "day")
      .createOrReplaceTempView("crt_src1")
    s.sql(s"""
      CREATE OR REPLACE TABLE crt.r1 USING graft_snapshot
      PARTITIONED BY (day) LOCATION '$base'
      AS SELECT * FROM crt_src1
    """)
    assert(s.sql("SELECT COUNT(*) FROM crt_r1").head.getLong(0) == 20)
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val v1 = SnapshotLog.readManifest(fs, bp).get.version

    // replace with a DIFFERENT schema
    (1L to 5L).map(i => (i, s"n$i", s"d${i % 2}")).toDF("id", "name", "day")
      .createOrReplaceTempView("crt_src2")
    s.sql(s"""
      CREATE OR REPLACE TABLE crt.r1 USING graft_snapshot
      PARTITIONED BY (day) LOCATION '$base'
      AS SELECT * FROM crt_src2
    """)
    val m2 = SnapshotLog.readManifest(fs, bp).get
    assert(m2.version > v1, "replace must extend the SAME history")
    assert(m2.schema.get.fieldNames.toSeq == Seq("id", "name", "day"))
    assert(s.sql("SELECT COUNT(*) FROM crt_r1").head.getLong(0) == 5)
    // the pre-replace table still time-travels
    val old = SnapshotLog.readVersion(s, base, v1).get
    assert(old.count() == 20 && old.columns.contains("value"))
  }

  test("graft_snapshot DDL without PARTITIONED BY: unpartitioned create/CTAS/replace") {
    import s.implicits._
    val root = Files.createTempDirectory("graft_create_unpart").toString
    // empty DDL-first create, no partitioning clause
    s.sql(s"""
      CREATE TABLE crtu.t (id BIGINT, value DOUBLE)
      USING graft_snapshot LOCATION '$root/t'
    """)
    val bp = new Path(s"$root/t")
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(SnapshotLog.readManifest(fs, bp).get.props
      .get(SnapshotLog.PartColProp).contains(SnapshotLog.NoPartCol))
    s.sql("INSERT INTO crtu_t VALUES (1, 1.5), (2, 2.5)")
    assert(s.sql("SELECT COUNT(*) FROM crtu_t").head.getLong(0) == 2)
    assert(SnapshotLog.readManifest(fs, bp).get.files.keySet ==
      Set(SnapshotLog.SinglePart))

    // CTAS without PARTITIONED BY + the whole DML surface on the view
    (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "value")
      .createOrReplaceTempView("crtu_src")
    s.sql(s"""
      CREATE TABLE crtu.c USING graft_snapshot LOCATION '$root/c'
      AS SELECT * FROM crtu_src
    """)
    assert(s.sql("SELECT COUNT(*) FROM crtu_c").head.getLong(0) == 20)
    s.sql("DELETE FROM crtu_c WHERE id % 2 = 0")
    s.sql("UPDATE crtu_c SET value = -1 WHERE id = 1")
    assert(s.sql("SELECT COUNT(*) FROM crtu_c").head.getLong(0) == 10)
    assert(s.sql("SELECT COUNT(*) FROM crtu_c WHERE value = -1")
      .head.getLong(0) == 1)

    // CREATE OR REPLACE flips the SAME path partitioned -> unpartitioned
    s.sql(s"""
      CREATE OR REPLACE TABLE crtu.c USING graft_snapshot LOCATION '$root/c'
      AS SELECT id, value, CAST(id % 2 AS STRING) AS day FROM crtu_src
    """)
    assert(s.sql("SELECT COUNT(*) FROM crtu_c").head.getLong(0) == 20)
    assert(SnapshotLog.readManifest(
      fs, new Path(s"$root/c")).get.files.keySet ==
      Set(SnapshotLog.SinglePart))
  }
}
