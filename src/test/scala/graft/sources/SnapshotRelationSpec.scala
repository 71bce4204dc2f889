package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.EventStreams.Event

/** Planner-integrated commit-log reads ([[SnapshotRelation]] /
  * [[SnapshotFileIndex]]): a plain `df.filter` on the relation must
  * skip files from manifest stats, blooms, and partition values INSIDE
  * Spark's planning — and pruning must never change results. */
class SnapshotRelationSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  /** 3 days × 600 rows; `value` = row index → clusterBy("value") gives
    * tight disjoint per-file bounds within each day. */
  private def mkTable(): String = {
    val base = Files.createTempDirectory("graft_snaprel").toString + "/tbl"
    val rows = (0 until 3).flatMap { day =>
      (0 until 600).map { i =>
        Event(day * 100000L + i, t(day * 1440L + i % 1440),
          day * 1000L + i, "e", day * 1000.0 + i)
      }
    }
    val df = rows.toDF().withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    SnapshotLog.upsertBatch(spark, base, df, Seq("event_id"), "ts", "day",
      batchId = 1, maxRetries = 5, statsCols = Seq("value", "user_id"),
      clusterBy = Seq("value"), clusterFiles = 4, opCol = None,
      writeCdf = false)
    base
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.count() // materialize AQE's final plan
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect { case s: FileSourceScanExec => s } ++
      (plan.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
      }.flatMap(_.collect { case s: FileSourceScanExec => s }))
    assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$plan")
    scans.head
  }

  test("plain filters prune files at plan time and keep results exact") {
    val base = mkTable()
    val (df, idx) = SnapshotRelation
      .applyWithIndex(spark, base, partCol = Some("day")).get
    val total = idx.manifest.allFiles.size
    assert(total >= 6, s"need multiple files to prove pruning, got $total")

    // unfiltered read sees everything
    assert(df.count() == 1800)
    df.count() // count() plans a scan; lastPruned reflects it
    assert(idx.lastPruned.exists { case (sel, tot) => sel == tot })

    // stats pruning: one day's middle value band lives in few files
    val q = df.filter(col("value") >= 1200.0 && col("value") < 1300.0)
    val got = q.select("event_id").collect().map(_.getLong(0)).toSet
    val want = (200 until 300).map(i => 100000L + i).toSet
    assert(got == want, "stats-pruned filter changed results")
    val (sel, tot) = idx.lastPruned.get
    assert(sel < tot, s"value-band filter pruned nothing ($sel/$tot)")

    // partition pruning via the partition column
    val day1 = idx.manifest.files.keySet.toSeq.sorted.apply(1)
    val qp = df.filter(col("day") === day1)
    assert(qp.count() == 600)
    val (selP, totP) = idx.lastPruned.get
    assert(selP == idx.manifest.files(day1).size && selP < totP,
      s"partition filter selected $selP of $totP")

    // unsupported predicate shapes degrade to keep-all, not wrong rows
    val qu = df.filter(expr("value % 2 = 0"))
    assert(qu.count() == 900)
    assert(idx.lastPruned.exists { case (s2, t2) => s2 == t2 })

    // parquet pushdown still happens below the index (stock scan node)
    val pushed = scanOf(q).metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(value,1200.0)"),
      s"parquet PushedFilters missing: $pushed")
  }

  test("bloom probes, time travel, and auto-broadcast ride the relation") {
    val base = mkTable()
    // metadata-only bloom pass on the NON-clustered high-card key
    SnapshotLog.buildBlooms(spark, base, Seq("user_id"))
    val (df, idx) = SnapshotRelation
      .applyWithIndex(spark, base, partCol = Some("day")).get

    val hit = df.filter(col("user_id") === 2123L)
    assert(hit.select("event_id").collect().map(_.getLong(0)).toSet ==
      Set(200123L))
    val (sel, tot) = idx.lastPruned.get
    assert(sel < tot, s"bloom equality probe pruned nothing ($sel/$tot)")

    // IN-list unions per-value pruning
    val inq = df.filter(col("user_id").isin(123L, 2123L))
    assert(inq.count() == 2)
    assert(idx.lastPruned.exists { case (s2, t2) => s2 < t2 })

    // time travel: a second batch changes v2; versionAsOf=1 still plans
    // and reads the original snapshot
    val extra = Seq(Event(999999L, t(10), 1L, "x", 1.0)).toDF()
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    SnapshotLog.upsertBatch(spark, base, extra, Seq("event_id"), "ts", "day",
      batchId = 2, maxRetries = 5, statsCols = Seq("value", "user_id"),
      clusterBy = Nil, clusterFiles = 4, opCol = None, writeCdf = false)
    val v1 = SnapshotRelation.read(spark, base, versionAsOf = Some(1L)).get
    assert(v1.count() == 1800)
    assert(SnapshotRelation.read(spark, base).get.count() == 1801)

    // sizeInBytes reports live bytes → small snapshot auto-broadcasts
    val dim = df.filter(col("value") < 100.0).select("user_id", "value")
    val fact = spark.range(0, 1000).toDF("user_id")
    val joined = fact.join(dim, "user_id")
    val hasBroadcast = joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin")
    assert(hasBroadcast, "small commit-log relation did not broadcast")
  }
}
