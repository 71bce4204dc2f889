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

  /** The derived conjuncts of a plan's Filter nodes, by referenced
    * column name — direct evidence of WHICH partition columns derived. */
  private def filterRefs(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.references.map(_.name).toSet
    }.flatten.toSet

  test("compound (y, m) layout: BOTH generated columns derive from one ts range") {
    val base = Files.createTempDirectory("graft_genym").toString + "/tbl"
    val rows = for (y <- 2023 to 2024; mth <- 1 to 6; d <- 1 to 5)
      yield ((y.toLong * 10000 + mth * 100 + d),
        Timestamp.valueOf(f"$y-$mth%02d-$d%02d 12:00:00"))
    val df = rows.toDF("id", "ts")
      .withColumn("y", year(col("ts")))
      .withColumn("m", date_format(col("ts"), "yyyy-MM"))
    SnapshotLog.appendBatch(spark, base, df, "y,m", batchId = 1,
      propsAdd = Map(SnapshotLog.PartColProp -> "y,m",
        SnapshotLog.GenColPrefix + "y" -> "year(ts)",
        SnapshotLog.GenColPrefix + "m" -> "date_format(ts, 'yyyy-MM')"))
    val (rel, idx) = SnapshotRelation.applyWithIndex(ext, base).get
    assert(idx.partitionSchema.fieldNames.toSeq == Seq("y", "m"))
    val q = rel.filter(
      col("ts") >= lit(Timestamp.valueOf("2024-02-01 00:00:00")) &&
        col("ts") < lit(Timestamp.valueOf("2024-04-01 00:00:00")))
    // BOTH partition columns must appear in the derived filter — not
    // just the one whose pruning happens to subsume the other
    val refs = filterRefs(q)
    assert(refs.contains("y") && refs.contains("m"),
      s"both components must derive, filter references $refs")
    val got = q.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val want = (for (mth <- 2 to 3; d <- 1 to 5)
      yield 2024L * 10000 + mth * 100 + d).sorted
    assert(got == want, "compound derivation must not change results")
    val (sel, tot) = idx.lastPruned.get
    // 12 (y, m) cells; 3 survive — Feb, Mar, and the April cell the
    // NON-STRICT derived upper bound keeps (f is flat within a month,
    // so `ts < Apr 1` can only derive `m <= '2024-04'`; the row filter
    // then excludes April's rows exactly)
    assert(sel <= tot / 4, s"3 of 12 cells should survive ($sel/$tot)")
  }

  test("compound layout with a NON-derivable component still derives the other") {
    val base = Files.createTempDirectory("graft_genym2").toString + "/tbl"
    val rows = for (y <- 2023 to 2024; mth <- 1 to 6; d <- 1 to 5)
      yield ((y.toLong * 10000 + mth * 100 + d),
        Timestamp.valueOf(f"$y-$mth%02d-$d%02d 12:00:00"))
    // m = month(ts) is NOT monotone in ts — range derivation must
    // refuse it per-column while y = year(ts) still derives
    val df = rows.toDF("id", "ts")
      .withColumn("y", year(col("ts")))
      .withColumn("m", month(col("ts")))
    SnapshotLog.appendBatch(spark, base, df, "y,m", batchId = 1,
      propsAdd = Map(SnapshotLog.PartColProp -> "y,m",
        SnapshotLog.GenColPrefix + "y" -> "year(ts)",
        SnapshotLog.GenColPrefix + "m" -> "month(ts)"))
    val (rel, idx) = SnapshotRelation.applyWithIndex(ext, base).get
    val q = rel.filter(
      col("ts") >= lit(Timestamp.valueOf("2024-01-01 00:00:00")))
    val refs = filterRefs(q)
    assert(refs.contains("y") && !refs.contains("m"),
      s"only the monotone component may derive a range, got $refs")
    assert(q.count() == 30, "per-column refusal must not change results")
    val (sel, tot) = idx.lastPruned.get
    assert(sel <= tot / 2, s"2023's 6 cells should prune ($sel/$tot)")
  }
}
