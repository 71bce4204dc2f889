package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.EventStreams.Event

/** Materialized change-data-feed contract ([[SnapshotLog]] `_cdf/v*`):
  * each committed version's feed is written once at commit time from the
  * affected partitions only, v1 is the initial load (all inserts),
  * unchanged rows never appear, deletes and update pre/post images do, a
  * missing version is a repairable GAP (manifests stay the source of
  * truth), and the built-in file streaming source tails the feed to a
  * convergent incrementally-maintained aggregate under any micro-batch
  * slicing. */
class CdfSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  private def mkChanges(rows: (Long, Long, String, Double)*) =
    rows.map { case (id, uid, et, v) => Event(id, t(id), uid, et, v) }
      .toDF()
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))

  private def upsert(base: String, df: org.apache.spark.sql.DataFrame,
      batchId: Long, opCol: Option[String] = None): Unit =
    SnapshotLog.upsertBatch(spark, base, df, Seq("user_id"), "ts", "day",
      batchId, maxRetries = 5, statsCols = Nil, clusterBy = Nil,
      clusterFiles = 16, opCol = opCol, writeCdf = true)

  private def feedSet(df: org.apache.spark.sql.DataFrame) =
    df.select("user_id", "value", "change_type")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet

  test("writeCdf materializes per-version feeds: inserts, updates, deletes") {
    val base = Files.createTempDirectory("graft_cdf").toString + "/tbl"
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

    upsert(base, mkChanges((1, 1, "a", 10.0), (2, 2, "a", 20.0), (1441, 3, "a", 30.0)), 1)
    // batch 2: update user 2, insert user 4, delete user 1, leave user 3 alone
    upsert(base,
      mkChanges((3, 2, "b", 25.0), (4, 4, "a", 40.0), (5, 1, "a", 0.0))
        .withColumn("op", when(col("user_id") === 1L, "D").otherwise("U")),
      2, opCol = Some("op"))

    assert(SnapshotLog.cdfVersions(fs, new Path(base)) == Seq(1L, 2L))
    val cdf = SnapshotLog.readCdf(spark, base).get

    val v1 = cdf.filter(col("_commit_version") === 1L)
    assert(v1.select("change_type").distinct().as[String].collect().toSeq == Seq("insert"))
    assert(feedSet(v1) == Set((1L, 10.0, "insert"), (2L, 20.0, "insert"), (3L, 30.0, "insert")))

    val v2 = feedSet(cdf.filter(col("_commit_version") === 2L))
    assert(v2 == Set(
      (2L, 20.0, "update_preimage"), (2L, 25.0, "update_postimage"),
      (4L, 40.0, "insert"), (1L, 10.0, "delete")),
      s"unchanged user 3 must not appear; got $v2")

    // the materialized feed IS the manifest diff
    val fromManifests =
      feedSet(SnapshotLog.diffVersions(spark, base, Seq("user_id"), 1L, 2L).get)
    assert(v2 == fromManifests)
  }

  test("repairCdf reconstructs a missing version from the manifests") {
    val base = Files.createTempDirectory("graft_cdf_gap").toString + "/tbl"
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

    upsert(base, mkChanges((1, 1, "a", 10.0), (2, 2, "a", 20.0)), 1)
    upsert(base, mkChanges((3, 2, "b", 25.0)), 2)
    assert(SnapshotLog.repairCdf(spark, base, Seq("user_id")) == Nil)

    val expected = feedSet(
      SnapshotLog.readCdf(spark, base).get.filter(col("_commit_version") === 2L))
    // simulate a crash between manifest commit and feed write
    fs.delete(new Path(base, "_cdf/v00000000002"), true)
    assert(SnapshotLog.cdfVersions(fs, new Path(base)) == Seq(1L))

    assert(SnapshotLog.repairCdf(spark, base, Seq("user_id")) == Seq(2L))
    val repaired = feedSet(
      SnapshotLog.readCdf(spark, base).get.filter(col("_commit_version") === 2L))
    assert(repaired == expected)
  }

  test("stream→table→stream: the streaming sink's CDF feeds a downstream tail") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft_chain").toString
    val base = root + "/tbl"
    val input = MemoryStream[Event]
    val withDay = input.toDF().withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val up = graft.streaming.EventStreams.streamingUpsertLog(
      withDay, base, key = "user_id", orderCol = "ts",
      checkpointDir = s"$root/ckpt_up", partCol = "day", writeCdf = true)
    try {
      input.addData(Event(1, t(0), 1L, "a", 10.0), Event(2, t(0), 2L, "a", 20.0))
      up.processAllAvailable()
      input.addData(Event(3, t(5), 2L, "b", 25.0), Event(4, t(5), 3L, "a", 30.0))
      up.processAllAvailable()
    } finally up.stop()

    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(SnapshotLog.cdfVersions(fs, new Path(base)).size == 2)
    // downstream: maintain per-user latest value count from the feed
    val schema = SnapshotLog.readCdf(spark, base).get.schema
    val acc = scala.collection.mutable.Map.empty[Long, Long]
    val down = SnapshotLog.tailCdf(spark, base, schema)
      .writeStream
      .option("checkpointLocation", s"$root/ckpt_down")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.select(col("user_id"),
          when(col("change_type").isin("insert", "update_postimage"), 1L)
            .otherwise(-1L).as("sign"))
          .collect().foreach { r =>
            acc(r.getLong(0)) = acc.getOrElse(r.getLong(0), 0L) + r.getLong(1)
          }
        ()
      }
      .start()
    down.awaitTermination()
    val live = SnapshotLog.read(spark, base).get
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(acc.filter(_._2 > 0).keySet == live,
      s"downstream state ${acc.toMap} vs live $live")
  }

  test("streaming tail converges to the live state under 1-file micro-batches") {
    val root = Files.createTempDirectory("graft_cdf_tail").toString
    val base = root + "/tbl"

    upsert(base, mkChanges((1, 1, "a", 10.0), (2, 2, "a", 20.0), (1441, 3, "a", 30.0)), 1)
    upsert(base,
      mkChanges((3, 2, "b", 25.0), (4, 4, "a", 40.0), (5, 1, "a", 0.0))
        .withColumn("op", when(col("user_id") === 1L, "D").otherwise("U")),
      2, opCol = Some("op"))

    val schema = SnapshotLog.readCdf(spark, base).get.schema
    val acc = scala.collection.mutable.Map.empty[String, (Long, BigDecimal)]
    var batches = 0
    val q = SnapshotLog.tailCdf(spark, base, schema, maxFilesPerTrigger = 1)
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches += 1
        b.select(col("day"), col("value"),
          when(col("change_type").isin("insert", "update_postimage"), 1L)
            .otherwise(-1L).as("sign"))
          .collect().foreach { r =>
            val (n0, v0) = acc.getOrElse(r.getString(0), (0L, BigDecimal(0)))
            acc(r.getString(0)) = (
              n0 + r.getLong(2),
              v0 + BigDecimal(r.getDouble(1)) * r.getLong(2))
          }
        ()
      }
      .start()
    q.awaitTermination()

    assert(batches >= 2, s"1-file trigger must slice into multiple batches, got $batches")
    val live = SnapshotLog.read(spark, base).get
      .groupBy("day")
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(38,4)")).as("t"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2)))))
      .toMap
    val maintained = acc.toMap.filter(_._2._1 > 0)
    assert(maintained.keySet == live.keySet)
    maintained.foreach { case (day, (n, v)) =>
      assert(n == live(day)._1 && v.compare(live(day)._2) == 0,
        s"day $day maintained ($n,$v) != live ${live(day)}")
    }
  }
}
