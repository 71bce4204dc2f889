package graft.plans

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{SnapshotLog, SnapshotRelation}

/** [[DerivePartitionFilter]] — Delta's generated-column partition
  * pruning: a filter on the BASE column (ts) must prune the partitions
  * of its GENERATED partition column (month = date_format(ts, ...)),
  * with exact results; unknown/non-monotone generation shapes must
  * change nothing. */
class DerivePartitionFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ext: SparkSession = graft.GraftSessions.withExtensions(spark)

  private def ts(month: Int, day: Int): Timestamp =
    Timestamp.valueOf(f"2024-$month%02d-$day%02d 12:00:00")

  /** 6 months × 20 rows, partitioned by generated month string. */
  private def mkTable(genSql: String): String = {
    val base = Files.createTempDirectory("graft_genprune").toString + "/tbl"
    val rows = for (m <- 1 to 6; d <- 1 to 20)
      yield (m * 100L + d, ts(m, d), m * 1.0 + d)
    val df = rows.toDF("id", "ts", "v")
      .withColumn("month", date_format(col("ts"), "yyyy-MM"))
    SnapshotLog.appendBatch(spark, base, df, "month", batchId = 1,
      propsAdd = Map(SnapshotLog.PartColProp -> "month",
        SnapshotLog.GenColPrefix + "month" -> genSql))
    base
  }

  test("a ts range filter prunes generated month partitions exactly") {
    val base = mkTable("date_format(ts, 'yyyy-MM')")
    val (df, idx) = SnapshotRelation.applyWithIndex(ext, base).get
    assert(idx.partitionSchema.fieldNames.toSeq == Seq("month"))
    val q = df.filter(col("ts") >= lit(ts(3, 1)) && col("ts") < lit(ts(5, 1)))
    val got = q.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val want = (for (m <- 3 to 4; d <- 1 to 20) yield m * 100L + d).sorted
    assert(got == want, "derived pruning must not change results")
    val (sel, tot) = idx.lastPruned.get
    assert(sel < tot, s"expected partition pruning from the ts filter " +
      s"($sel/$tot)")
    assert(sel <= tot / 2, s"2 of 6 months should survive, kept $sel/$tot")
  }

  test("ts equality and IN derive for any generation shape") {
    val base = mkTable("date_format(ts, 'yyyy-MM')")
    val (df, idx) = SnapshotRelation.applyWithIndex(ext, base).get
    val q = df.filter(col("ts") === lit(ts(2, 5)))
    assert(q.select("id").collect().map(_.getLong(0)).toSeq == Seq(205L))
    val (sel, tot) = idx.lastPruned.get
    assert(sel <= tot / 3, s"one month's files should survive, $sel/$tot")
  }

  test("unknown generation shapes derive nothing and stay exact") {
    val base = mkTable("concat(date_format(ts, 'yyyy'), '-x')")
    // the declared expr doesn't match the written values' derivation —
    // irrelevant here: the rule must REFUSE the shape outright
    val (df, idx) = SnapshotRelation.applyWithIndex(ext, base).get
    val q = df.filter(col("ts") >= lit(ts(3, 1)))
    assert(q.count() == 80)
    val (sel, tot) = idx.lastPruned.get
    assert(sel == tot, "no derivation -> no partition pruning")
  }

  test("derivation works through cardinality-preserving Projects") {
    val base = mkTable("date_format(ts, 'yyyy-MM')")
    val (df, idx) = SnapshotRelation.applyWithIndex(ext, base).get
    // projected-then-filtered: the scan is pruned/aliased before the
    // filter — the rule must trace lineage through the Project instead
    // of matching only Filter-directly-over-relation
    val q = df.select(col("id").as("ident"), col("ts"), col("month"))
      .filter(col("ts") >= lit(ts(3, 1)) && col("ts") < lit(ts(5, 1)))
    val got = q.select("ident").collect().map(_.getLong(0)).sorted.toSeq
    val want = (for (m <- 3 to 4; d <- 1 to 20) yield m * 100L + d).sorted
    assert(got == want)
    val (sel, tot) = idx.lastPruned.get
    assert(sel <= tot / 2,
      s"projected shape should still prune 2 of 6 months, kept $sel/$tot")
    // a COMPUTED ts (shifted) must NOT derive — lineage is untraceable
    val q2 = df.select(col("id"),
      (col("ts") + expr("INTERVAL 40 DAYS")).as("ts"), col("month"))
      .filter(col("ts") >= lit(ts(3, 1)))
    assert(q2.count() == 100,
      "months 2..6 rows shifted by 40 days pass the filter")
    val (sel2, tot2) = idx.lastPruned.get
    assert(sel2 == tot2, "computed base column -> no derivation")
  }

  test("a reading session timezone differing from the stamp refuses derivation") {
    val base = mkTable("date_format(ts, 'yyyy-MM')")
    // the write stamped UTC (the suite's session tz)
    val bp = new org.apache.hadoop.fs.Path(base)
    val m = SnapshotLog.readManifest(
      bp.getFileSystem(ext.sparkContext.hadoopConfiguration), bp).get
    assert(m.props.get(SnapshotLog.GenTzProp).contains("UTC"),
      s"writer stamped its generation timezone, got ${m.props.get(SnapshotLog.GenTzProp)}")
    val before = ext.conf.get("spark.sql.session.timeZone")
    try {
      ext.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
      val (df, idx) = SnapshotRelation.applyWithIndex(ext, base).get
      val q = df.filter(col("ts") >= lit(ts(3, 1)) && col("ts") < lit(ts(5, 1)))
      assert(q.count() == 40, "results stay exact under any timezone")
      val (sel, tot) = idx.lastPruned.get
      assert(sel == tot,
        s"tz mismatch must refuse derivation (pruned $sel/$tot)")
    } finally ext.conf.set("spark.sql.session.timeZone", before)
  }

  test("year() generation prunes an int partition column") {
    val base = Files.createTempDirectory("graft_genyr").toString + "/tbl"
    val rows = for (y <- 2020 to 2023; d <- 1 to 10)
      yield (y * 100L + d, Timestamp.valueOf(s"$y-06-0${d % 9 + 1} 00:00:00"))
    val df = rows.toDF("id", "ts").withColumn("yr", year(col("ts")))
    SnapshotLog.appendBatch(spark, base, df, "yr", batchId = 1,
      propsAdd = Map(SnapshotLog.PartColProp -> "yr",
        SnapshotLog.GenColPrefix + "yr" -> "year(ts)"))
    val (rel, idx) = SnapshotRelation.applyWithIndex(ext, base).get
    assert(idx.partitionSchema.fieldNames.toSeq == Seq("yr"))
    val q = rel.filter(col("ts") >= lit(Timestamp.valueOf("2022-01-01 00:00:00")))
    assert(q.count() == 20)
    val (sel, tot) = idx.lastPruned.get
    assert(sel <= tot / 2, s"2 of 4 years should survive, $sel/$tot")
  }
}
