package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}

/** `CONVERT TO graft_snapshot` — in-place adoption of an existing
  * parquet directory: zero files rewritten, full verb surface
  * afterwards, and the layout contract (column-carrying files,
  * per-file single-valued partition column) enforced loudly. */
class ConvertInPlaceSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  private def fsOf(bp: Path) =
    bp.getFileSystem(s.sparkContext.hadoopConfiguration)

  test("convert adopts existing files in place; whole verb surface works after") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_conv1").toString + "/lake"
    // a realistic lake layout: Hive dirs AND the column in contents
    // (the writer kept it — this engine's own staging convention)
    val rows = (1L to 120L).map(i => (i, i * 1.0, s"d${i % 3}"))
      .toDF("id", "value", "day")
    rows.withColumn("__p", col("day")).repartition(2)
      .write.partitionBy("__p").parquet(base)
    val bp = new Path(base)
    val preFiles = {
      val it = fsOf(bp).listFiles(bp, true)
      val b = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val n = it.next().getPath.getName
        if (n.endsWith(".parquet")) b += n
      }
      b.toSet
    }

    val r = s.sql(s"CONVERT TO GRAFT_SNAPSHOT '$base' " +
      "PARTITIONED BY (day) AS conv.lake").collect().head
    assert(r.getString(0) == "CONVERT" && r.getLong(1) == 1L)

    val m = SnapshotLog.readManifest(fsOf(bp), bp).get
    // in place: the manifest references EXACTLY the pre-existing files
    assert(m.allFiles.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
      == preFiles, "conversion must not rewrite or add data files")
    assert(m.files.keySet == Set("d0", "d1", "d2"))
    // the conversion scan harvested rows/bytes/partition bounds:
    // metadata COUNT(*) works with zero file reads
    assert(SnapshotLog.countRows(m).contains(120L))

    // reads + the whole verb surface on the adopted files
    assert(s.sql("SELECT COUNT(*) FROM conv_lake").head.getLong(0) == 120)
    s.sql("DELETE FROM conv_lake WHERE id <= 20")
    s.sql("UPDATE conv_lake SET value = value * 2 WHERE id = 30")
    assert(s.sql("SELECT COUNT(*) FROM conv_lake").head.getLong(0) == 100)
    assert(s.sql("SELECT value FROM conv_lake WHERE id = 30").head.getDouble(0)
      == 60.0)
    // time travel back to the adopted snapshot
    assert(SnapshotLog.readVersion(s, base, 1L).get.count() == 120)
    // maintenance
    s.sql("OPTIMIZE conv_lake")
    assert(s.sql("SELECT COUNT(*) FROM conv_lake").head.getLong(0) == 100)

    // converting again refuses
    val e = intercept[Exception] {
      s.sql(s"CONVERT TO GRAFT_SNAPSHOT '$base' " +
        "PARTITIONED BY (day) AS conv.lake2")
    }
    assert(e.getMessage.contains("already"), e.getMessage)
  }

  test("Hive layout that dropped the column from contents refuses with the enrichment hint") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_conv2").toString + "/lake"
    (1L to 30L).map(i => (i, s"d${i % 2}")).toDF("id", "day")
      .write.partitionBy("day").parquet(base) // drops day from contents
    val e = intercept[Exception] {
      s.sql(s"CONVERT TO GRAFT_SNAPSHOT '$base' " +
        "PARTITIONED BY (day) AS conv.bad1")
    }
    assert(e.getMessage.contains("CONTENTS"), e.getMessage)
  }

  test("a file spanning two partition values refuses, naming the offender") {
    import s.implicits._
    val base = Files.createTempDirectory("graft_conv3").toString + "/lake"
    (1L to 30L).map(i => (i, s"d${i % 2}")).toDF("id", "day")
      .coalesce(1).write.parquet(base) // one file, two day values
    val e = intercept[Exception] {
      s.sql(s"CONVERT TO GRAFT_SNAPSHOT '$base' " +
        "PARTITIONED BY (day) AS conv.bad2")
    }
    assert(e.getMessage.contains("more than one") &&
      e.getMessage.contains(".parquet"), e.getMessage)
  }
}
