package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.sources.SnapshotLog

/** The commit-log streaming SINK ([[CommitLogSinkProvider]]):
  * exactly-once via (appId, batchId) transaction watermarks in the
  * manifest — replayed micro-batches no-op, concurrent duplicate
  * writers cannot double-apply, and the watermark survives unrelated
  * table operations (including RESTORE, which must merge it forward,
  * never roll it back). */
class CommitLogSinkSpec extends SparkSpec {
  import spark.implicits._

  private def mkSink(
      base: String, appId: String,
      keys: Seq[String] = Nil, opCol: Option[String] = None) = {
    val params = Map("path" -> base, "partCol" -> "day", "appId" -> appId) ++
      (if (keys.nonEmpty) Map("keys" -> keys.mkString(",")) else Map.empty) ++
      opCol.map("opCol" -> _).toMap
    new CommitLogSinkProvider()
      .createSink(spark.sqlContext, params, Nil, OutputMode.Append())
  }

  private def fsOf(base: String) =
    new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifest(base: String) =
    SnapshotLog.readManifest(
      fsOf(base), new org.apache.hadoop.fs.Path(base)).get

  private def snap(base: String): Set[(Long, Long, String)] =
    SnapshotLog.read(spark, base).get
      .select(col("id"), col("v"), col("day"))
      .as[(Long, Long, String)].collect().toSet

  test("append mode: replayed batchId is a no-op, new batchId lands") {
    val base = Files.createTempDirectory("graft_sink_app").toString + "/tbl"
    val sink = mkSink(base, appId = "appA")
    sink.addBatch(0, Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "v", "day"))
    assert(snap(base) == Set((1L, 1L, "a"), (2L, 1L, "b")))
    val v1 = manifest(base).version

    // the exact failure mode Structured Streaming contracts for:
    // the same batchId re-delivered (possibly with recomputed rows)
    sink.addBatch(0, Seq((99L, 99L, "z")).toDF("id", "v", "day"))
    assert(snap(base) == Set((1L, 1L, "a"), (2L, 1L, "b")),
      "replayed batch 0 must not append")
    assert(manifest(base).version == v1,
      "replay must not even commit a version")

    sink.addBatch(1, Seq((3L, 1L, "a")).toDF("id", "v", "day"))
    assert(snap(base) ==
      Set((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "a")))

    // a DIFFERENT app's batch 0 is not this app's batch 0
    mkSink(base, appId = "appB")
      .addBatch(0, Seq((4L, 1L, "b")).toDF("id", "v", "day"))
    assert(snap(base).map(_._1) == Set(1L, 2L, 3L, 4L))
  }

  test("upsert mode with CDC deletes: exactly-once across replay") {
    val base = Files.createTempDirectory("graft_sink_ups").toString + "/tbl"
    val sink = mkSink(base, "cdc1", keys = Seq("id"), opCol = Some("op"))
    sink.addBatch(0, Seq((1L, 1L, "a", "U"), (2L, 1L, "b", "U"))
      .toDF("id", "v", "day", "op"))
    sink.addBatch(1, Seq((1L, 2L, "a", "U"), (2L, 0L, "b", "D"))
      .toDF("id", "v", "day", "op"))
    assert(snap(base) == Set((1L, 2L, "a")))

    // replay batch 1 — the delete must not "re-fire" on other rows and
    // the update must not double-apply
    sink.addBatch(1, Seq((1L, 9L, "a", "U")).toDF("id", "v", "day", "op"))
    assert(snap(base) == Set((1L, 2L, "a")),
      "replayed upsert batch must be skipped entirely")
  }

  test("concurrent duplicate writers: one wins, one no-ops") {
    val base = Files.createTempDirectory("graft_sink_race").toString + "/tbl"
    mkSink(base, "boot").addBatch(0,
      Seq((1L, 1L, "a")).toDF("id", "v", "day"))
    // two drivers running the same checkpointed query = same appId,
    // same batchId, both appending; the table must absorb it ONCE
    val df = Seq((2L, 1L, "a"), (3L, 1L, "b")).toDF("id", "v", "day")
    val threads = (1 to 2).map { _ =>
      new Thread(() => mkSink(base, "dup").addBatch(5, df))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val got = SnapshotLog.read(spark, base).get
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"duplicate concurrent batch must apply exactly once, got $got")
  }

  test("watermark survives maintenance and merges forward through RESTORE") {
    val base = Files.createTempDirectory("graft_sink_restore").toString + "/tbl"
    val sink = mkSink(base, "wm", keys = Seq("id"))
    sink.addBatch(0, Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "v", "day"))
    val vAfterB0 = manifest(base).version
    sink.addBatch(1, Seq((1L, 2L, "a")).toDF("id", "v", "day"))

    // roll the DATA back to the b0 state — the watermark must not follow
    SnapshotLog.restoreTable(spark, base, vAfterB0)
    assert(snap(base) == Set((1L, 1L, "a"), (2L, 1L, "b")))
    sink.addBatch(1, Seq((1L, 7L, "a")).toDF("id", "v", "day"))
    assert(snap(base) == Set((1L, 1L, "a"), (2L, 1L, "b")),
      "RESTORE must not resurrect an absorbed batchId")

    // unrelated commits (stats) carry the watermark forward too
    SnapshotLog.computeStats(spark, base, Seq("v"))
    sink.addBatch(1, Seq((1L, 8L, "a")).toDF("id", "v", "day"))
    assert(snap(base) == Set((1L, 1L, "a"), (2L, 1L, "b")))
    // ...while a genuinely new batch still lands
    sink.addBatch(2, Seq((3L, 1L, "b")).toDF("id", "v", "day"))
    assert(snap(base) == Set((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "b")))
  }

  test("autoCompactFiles bounds per-partition file counts under micro-batches") {
    val base = Files.createTempDirectory("graft_sink_ac").toString + "/tbl"
    val params = Map("path" -> base, "partCol" -> "day", "appId" -> "ac",
      "keys" -> "id", "autoCompactFiles" -> "3")
    val sink = new CommitLogSinkProvider()
      .createSink(spark.sqlContext, params, Nil, OutputMode.Append())
    // 8 micro-batches, each landing one new key in ONE partition —
    // without auto-compaction that is up to 8 files in 'a'
    (0 until 8).foreach { b =>
      sink.addBatch(b, Seq((100L + b, 1L, "a")).toDF("id", "v", "day"))
    }
    val m = manifest(base)
    assert(m.files("a").size <= 3,
      s"auto-compaction must bound the file count, got ${m.files("a").size}")
    assert(snap(base) == (0 until 8).map(b => (100L + b, 1L, "a")).toSet,
      "compaction must preserve every row")
    // replay of an absorbed batch still no-ops with compaction enabled
    val v = m.version
    sink.addBatch(3, Seq((999L, 9L, "a")).toDF("id", "v", "day"))
    assert(manifest(base).version == v && !snap(base).exists(_._1 == 999L))
  }

  test("end-to-end: a real streaming query lands each batch once") {
    val root = Files.createTempDirectory("graft_sink_e2e").toString
    val base = root + "/tbl"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    def runOnce(): Unit = {
      val q = mem.toDF().toDF("id", "v", "day")
        .writeStream
        .format(classOf[CommitLogSinkProvider].getName)
        .option("path", base)
        .option("partCol", "day")
        .option("keys", "id")
        .option("orderCol", "v")
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.processAllAvailable()
      q.stop()
    }
    mem.addData((1L, 1L, "a"), (2L, 1L, "b"))
    runOnce()
    assert(snap(base) == Set((1L, 1L, "a"), (2L, 1L, "b")))
    // restart from the same checkpoint with more data: run-1 rows must
    // not duplicate, run-2 rows land (the query id — the default appId —
    // is stable across the restart)
    mem.addData((1L, 2L, "a"), (3L, 1L, "b"))
    runOnce()
    assert(snap(base) == Set((1L, 2L, "a"), (2L, 1L, "b"), (3L, 1L, "b")))
    // the manifest records the query-id watermark
    val m = manifest(base)
    assert(m.txns.size == 1 && m.txns.values.head >= 1L,
      s"expected one query-id watermark at batch>=1, got ${m.txns}")
  }
}
