package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.sources.SnapshotLog

/** `spark.readStream.format("graft")` — the streaming read unified
  * under the format name (round-12 verdict item 2). Same source, same
  * commit-version offsets as the legacy `graft-commitlog` name; the
  * format default is the ROW feed (Delta's contract: fail on change
  * commits unless skipChangeCommits), `readChangeFeed` upgrades to CDF
  * rows. */
class FormatStreamSpec extends SparkSpec {
  import spark.implicits._

  private def append(base: String, batchId: Long, rows: (Long, Double, String)*): Unit =
    SnapshotLog.appendBatch(spark, base,
      rows.toSeq.toDF("id", "value", "day"), "day", batchId = batchId,
      writeCdf = true,
      propsAdd = Map(SnapshotLog.PartColProp -> "day"))

  test("format('graft') row feed streams appends; restart resumes from checkpoint") {
    val base = Files.createTempDirectory("graft_fstream").toString + "/tbl"
    val ckpt = Files.createTempDirectory("graft_fstream_ck").toString
    append(base, 1, (1L, 1.0, "a"), (2L, 1.0, "a"), (3L, 1.0, "b"))
    append(base, 2, (4L, 2.0, "b"))

    val received = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").load(base)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          // row feed: TABLE schema only, no CDF columns
          assert(df.columns.toSeq == Seq("id", "value", "day"))
          df.select(col("id")).collect().foreach(r => received.add(java.lang.Long.valueOf(r.getLong(0))))
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    runOnce()
    assert(received.asScala.toSeq.map(_.longValue).sorted ==
      Seq(1L, 2L, 3L, 4L))

    // new append while the stream is down: restart delivers ONLY it
    append(base, 3, (5L, 3.0, "a"))
    runOnce()
    assert(received.asScala.toSeq.map(_.longValue).sorted ==
      Seq(1L, 2L, 3L, 4L, 5L),
      "exactly-once across restart: no re-delivery of v1/v2")
  }

  test("row feed fails on a change commit; skipChangeCommits skips it") {
    val base = Files.createTempDirectory("graft_fstream2").toString + "/tbl"
    append(base, 1, (1L, 1.0, "a"), (2L, 1.0, "b"), (3L, 1.0, "b"))
    SnapshotLog.deleteWhere(spark, base, col("id") === 2L, "day",
      writeCdf = true)

    // default: the delete commit must FAIL the stream, loudly
    val err = intercept[StreamingQueryException] {
      val q = spark.readStream.format("graft").load(base)
        .writeStream.format("noop").start()
      q.processAllAvailable()
      q.stop()
    }
    assert(err.getMessage.contains("non-append") ||
      Option(err.getCause).exists(_.getMessage.contains("non-append")))

    // skipChangeCommits: appends flow, the delete commit is dropped
    val got = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val q = spark.readStream.format("graft")
      .option("skipChangeCommits", "true").load(base)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.select(col("id")).collect().foreach(r => got.add(java.lang.Long.valueOf(r.getLong(0))))
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(got.asScala.toSeq.map(_.longValue).sorted == Seq(1L, 2L, 3L),
      "the append feed (v1) streams; the delete commit is skipped whole")
  }

  test("writeStream.format('graft'): exactly-once sink round-trip under the format name") {
    val src = Files.createTempDirectory("graft_fsink").toString + "/src"
    val dst = Files.createTempDirectory("graft_fsink").toString + "/dst"
    val ckpt = Files.createTempDirectory("graft_fsink_ck").toString
    append(src, 1, (1L, 1.0, "a"), (2L, 1.0, "b"))
    append(src, 2, (3L, 2.0, "a"))

    def runOnce(): Unit = {
      // the FULL format-name pipeline: graft source -> graft sink
      val q = spark.readStream.format("graft").load(src)
        .writeStream.format("graft")
        .partitionBy("day")
        .option("checkpointLocation", ckpt)
        .option("appId", "fsink_rt")
        .start(dst)
      q.processAllAvailable()
      q.stop()
    }
    runOnce()
    val out = SnapshotLog.read(spark, dst).get
    assert(out.count() == 3)
    // sink-created table records its partition column
    val m = SnapshotLog.readManifest(
      new org.apache.hadoop.fs.Path(dst).getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(dst)).get
    assert(m.props.get(SnapshotLog.PartColProp).contains("day"))

    // restart from the same checkpoint: nothing re-lands (the
    // transaction watermark makes replayed batches no-ops)
    runOnce()
    assert(SnapshotLog.read(spark, dst).get.count() == 3,
      "a restarted stream must not duplicate rows")
    // new commit on the source flows through end-to-end
    append(src, 3, (9L, 9.0, "b"))
    runOnce()
    assert(SnapshotLog.read(spark, dst).get.count() == 4)
  }

  /** Append WITHOUT any change feed — the table shape the row feed
    * exists for (the round-12 ADVICE finding: `_cdf`-derived offsets
    * made these tables stream nothing forever). */
  private def appendNoCdf(base: String, batchId: Long,
      rows: (Long, Double, String)*): Unit =
    SnapshotLog.appendBatch(spark, base,
      rows.toSeq.toDF("id", "value", "day"), "day", batchId = batchId,
      propsAdd = Map(SnapshotLog.PartColProp -> "day"))

  test("row feed streams a CDF-LESS table from its committed data files") {
    val base = Files.createTempDirectory("graft_fstream4").toString + "/tbl"
    appendNoCdf(base, 1, (1L, 1.0, "a"), (2L, 1.0, "b"))
    appendNoCdf(base, 2, (3L, 2.0, "a"))
    // a metadata-only commit mid-history must be a silent no-op for
    // the row feed, never a "change commit" failure
    SnapshotLog.setProperties(spark, base, Map("owner.team" -> "etl"))
    appendNoCdf(base, 3, (4L, 3.0, "b"))

    val got = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val q = spark.readStream.format("graft").load(base)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.select(col("id")).collect()
          .foreach(r => got.add(java.lang.Long.valueOf(r.getLong(0))))
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(got.asScala.toSeq.map(_.longValue).sorted == Seq(1L, 2L, 3L, 4L),
      "appends stream straight from manifest file deltas, no _cdf anywhere")

    // the CHANGE feed on the same table fails FAST (source creation on
    // the stream thread — the first poll surfaces it, not a silent
    // zero-row stream)
    val err = intercept[Exception] {
      val qc = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(base)
        .writeStream.format("noop").start()
      try qc.processAllAvailable() finally qc.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(err).exists(m => m != null && m.contains("change feed")))
  }

  test("startingVersion='latest' tails only post-start commits") {
    val base = Files.createTempDirectory("graft_fstream5").toString + "/tbl"
    val ckpt = Files.createTempDirectory("graft_fstream5_ck").toString
    appendNoCdf(base, 1, (1L, 1.0, "a"), (2L, 1.0, "b"))
    appendNoCdf(base, 2, (3L, 2.0, "a"))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "latest").load(base)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select(col("id")).collect()
            .foreach(r => got.add(java.lang.Long.valueOf(r.getLong(0))))
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    runOnce()
    assert(got.isEmpty, "nothing committed before the stream started flows")
    appendNoCdf(base, 3, (9L, 9.0, "b"))
    runOnce()
    assert(got.asScala.toSeq.map(_.longValue).sorted == Seq(9L),
      "the restart resumes from the checkpoint and sees only the tail")
  }

  test("initialSnapshot bootstraps table + tail in one stream, once") {
    val base = Files.createTempDirectory("graft_fstream6").toString + "/tbl"
    val ckpt = Files.createTempDirectory("graft_fstream6_ck").toString
    appendNoCdf(base, 1, (1L, 1.0, "a"), (2L, 1.0, "b"))
    appendNoCdf(base, 2, (3L, 2.0, "a"))
    // a DELETE before stream start: the snapshot must be DV-correct
    // (deleted row absent) even though the row feed could never
    // represent the delete itself
    SnapshotLog.deleteWhere(spark, base, col("id") === 2L, "day",
      deletionVectors = true)

    val got = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft")
        .option("initialSnapshot", "true").load(base)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select(col("id")).collect()
            .foreach(r => got.add(java.lang.Long.valueOf(r.getLong(0))))
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    runOnce()
    assert(got.asScala.toSeq.map(_.longValue).sorted == Seq(1L, 3L),
      "first batch = the DV-correct snapshot (id 2 deleted), despite " +
        "the delete commit predating the stream")
    // restart + new append: the snapshot must NOT re-deliver
    appendNoCdf(base, 4, (7L, 7.0, "b"))
    runOnce()
    assert(got.asScala.toSeq.map(_.longValue).sorted == Seq(1L, 3L, 7L),
      "a checkpointed restart tails only — no second snapshot")
  }

  test("readChangeFeed streams CDF rows equal to the batch feed") {
    val base = Files.createTempDirectory("graft_fstream3").toString + "/tbl"
    append(base, 1, (1L, 1.0, "a"), (2L, 1.0, "b"))
    SnapshotLog.deleteWhere(spark, base, col("id") === 1L, "day",
      writeCdf = true)

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(base)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.select(col("id"), col("change_type"), col("_commit_version"))
          .collect()
          .foreach(r => rows.add((r.getLong(0), r.getString(1), r.getLong(2))))
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = rows.toArray(Array.empty[(Long, String, Long)]).toSeq.sorted
    val batch = SnapshotLog.readCdf(spark, base).get
      .select(col("id"), col("change_type"), col("_commit_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted
    assert(streamed == batch,
      "the streamed CDF tail must equal the batch change feed")
  }

  test("maxBytesPerBatch: byte-weighted admission slices the catch-up") {
    val base = Files.createTempDirectory("graft_fstream4").toString + "/tbl"
    append(base, 1, (1L, 1.0, "a"), (2L, 1.0, "a"))
    append(base, 2, (3L, 2.0, "b"))
    append(base, 3, (4L, 3.0, "a"))

    // a 1-byte cap can never fit a whole commit — the at-least-one
    // rule must still admit exactly ONE version per micro-batch, so
    // the 3-commit catch-up arrives as 3 batches with nothing lost
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q = spark.readStream.format("graft")
      .option("maxBytesPerBatch", "1").load(base)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        batches.add(df.select(col("id")).collect().map(_.getLong(0)).toSeq)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val got = batches.asScala.toSeq.filter(_.nonEmpty)
    assert(got.size == 3, s"1-byte cap must slice per version, got $got")
    assert(got.flatten.sorted == Seq(1L, 2L, 3L, 4L))

    // a generous cap admits the whole catch-up as one batch
    val all = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q2 = spark.readStream.format("graft")
      .option("maxBytesPerBatch", "1g").load(base)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        all.add(df.select(col("id")).collect().map(_.getLong(0)).toSeq)
        ()
      }
      .start()
    q2.processAllAvailable()
    q2.stop()
    val got2 = all.asScala.toSeq.filter(_.nonEmpty)
    assert(got2.size == 1 && got2.head.sorted == Seq(1L, 2L, 3L, 4L),
      s"1g cap must admit the whole catch-up at once, got $got2")

    // spellings: suffixes parse, junk refuses loudly
    assert(CommitLogStream.parseBytes("2m") == (2L << 20))
    assert(CommitLogStream.parseBytes("1g") == (1L << 30))
    assert(CommitLogStream.parseBytes("512") == 512L)
    intercept[Exception] { CommitLogStream.parseBytes("lots") }
    intercept[Exception] { CommitLogStream.parseBytes("-5m") }
  }
}
