package graft.plans

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}
import graft.sources.{Catalog, SnapshotLog}

/** `graft.autoMergeSchema` (Delta's schema.autoMerge): when ON, an
  * `INSERT INTO … BY NAME` or a MERGE star-action whose source carries
  * EXTRA columns widens the table schema with them (new fields
  * nullable, existing rows read NULL); when OFF (the default) extras
  * are dropped (INSERT BY NAME) exactly as before. */
class AutoMergeSchemaSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  private def mk(name: String): (String, Path,
      org.apache.hadoop.fs.FileSystem, String) = {
    import s.implicits._
    val base = Files.createTempDirectory(s"graft_amerge_$name").toString + "/tbl"
    val rows = (1L to 60L).map(i => (i, i * 1.0, s"d${i % 3}"))
      .toDF("id", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 4, opCol = None, writeCdf = false)
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    (base, bp, fs, Catalog.registerSnapshotLog(s, "amerge", name, base, Some("day")))
  }

  test("INSERT BY NAME: extras are dropped OFF, widen the schema ON") {
    import s.implicits._
    val (_, bp, fs, view) = mk("ins")
    Seq((100L, 5.0, "d0", "web")).toDF("id", "value", "day", "source")
      .createOrReplaceTempView("amerge_src")

    // OFF (default): the extra column is dropped, schema unchanged
    s.sql(s"INSERT INTO $view BY NAME SELECT * FROM amerge_src")
    assert(SnapshotLog.readManifest(fs, bp).get.schema.get.fieldNames.toSeq ==
      Seq("id", "value", "day"))

    // ON: the extra column widens the schema; old rows read NULL
    s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
      s"('${SnapshotLog.AutoMergeProp}' = 'true')")
    Seq((101L, 6.0, "d1", "api")).toDF("id", "value", "day", "source")
      .createOrReplaceTempView("amerge_src2")
    s.sql(s"INSERT INTO $view BY NAME SELECT * FROM amerge_src2")
    val m = SnapshotLog.readManifest(fs, bp).get
    assert(m.schema.get.fieldNames.toSeq == Seq("id", "value", "day", "source"))
    assert(s.sql(s"SELECT source FROM $view WHERE id = 101").head.getString(0)
      == "api")
    assert(s.sql(s"SELECT COUNT(*) FROM $view WHERE source IS NULL").head
      .getLong(0) == 61L, "pre-widening rows (and the OFF insert) read NULL")
  }

  test("MERGE star-actions widen the target with extra source columns when ON") {
    import s.implicits._
    val (_, bp, fs, view) = mk("mrg")
    s.sql(s"ALTER TABLE $view SET TBLPROPERTIES " +
      s"('${SnapshotLog.AutoMergeProp}' = 'true')")
    Seq((5L, 50.0, "d2", "gold"), (200L, 9.0, "d0", "fresh"))
      .toDF("id", "value", "day", "tier")
      .createOrReplaceTempView("amerge_msrc")
    s.sql(s"""
      MERGE INTO $view t USING amerge_msrc s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
    """)
    val m = SnapshotLog.readManifest(fs, bp).get
    assert(m.schema.get.fieldNames.contains("tier"))
    assert(s.sql(s"SELECT tier FROM $view WHERE id = 5").head.getString(0)
      == "gold")
    assert(s.sql(s"SELECT tier FROM $view WHERE id = 200").head.getString(0)
      == "fresh")
    assert(s.sql(s"SELECT COUNT(*) FROM $view WHERE tier IS NULL").head
      .getLong(0) == 59L)
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 61L)
  }

  test("MERGE star with extras and the property OFF keeps the old schema") {
    import s.implicits._
    val (_, bp, fs, view) = mk("off")
    Seq((5L, 50.0, "d2", "gold")).toDF("id", "value", "day", "tier")
      .createOrReplaceTempView("amerge_osrc")
    s.sql(s"""
      MERGE INTO $view t USING amerge_osrc s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
    """)
    assert(SnapshotLog.readManifest(fs, bp).get.schema.get.fieldNames.toSeq ==
      Seq("id", "value", "day"))
    assert(s.sql(s"SELECT value FROM $view WHERE id = 5").head.getDouble(0)
      == 50.0)
  }
}
