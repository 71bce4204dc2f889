package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Typed partition exposure ([[SnapshotFileIndex.partitionSchema]]):
  * when every manifest partition key provably round-trips
  * string↔type, the partition column becomes a REAL Spark partition
  * column — static partition filters of ANY shape prune exactly
  * inside `listFiles` (Spark removes them from the post-scan filter,
  * so exclusion-proof-only pruning would return wrong rows), and
  * Spark's own dynamic partition pruning fires on fact⋈dim joins.
  * Every doubtful layout must degrade to the flat stats-pruned scan,
  * never to wrong rows. */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  /** ints 0..599, partitioned by `p = id % 6` (int partition col). */
  private def mkIntTable(): String = {
    val base = Files.createTempDirectory("graft_dpp").toString + "/tbl"
    val df = (0 until 600)
      .map(i => (i.toLong, i % 6, s"v$i")).toDF("id", "p", "s")
    SnapshotLog.appendBatch(spark, base, df, "p", batchId = 1)
    base
  }

  /** All scans, descending through AQE stage leaves — `collect` alone
    * stops at `QueryStageExec` (a leaf wrapping a materialized
    * subtree). */
  private def allScans(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p.collect {
      case s: FileSourceScanExec => Seq(s)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
    }.flatten

  private def scansOf(df: DataFrame): Seq[FileSourceScanExec] = {
    df.collect()
    allScans(df.queryExecution.executedPlan)
  }

  test("typed exposure: partition column is a real partition column") {
    val base = mkIntTable()
    val (df, idx) = SnapshotRelation
      .applyWithIndex(spark, base, partCol = Some("p")).get
    assert(idx.partitionSchema.fieldNames.toSeq == Seq("p"))
    // user-visible column order unchanged by the overlap merge
    assert(df.columns.toSeq == Seq("id", "p", "s"))
    // values come from partition metadata, bit-equal to file contents
    val direct = spark.read.parquet(idx.inputFiles: _*)
      .select("id", "p", "s").collect().toSet
    assert(df.collect().toSet == direct)
  }

  test("static partition filters of arbitrary shape prune exactly") {
    val base = mkIntTable()
    val (df, idx) = SnapshotRelation
      .applyWithIndex(spark, base, partCol = Some("p")).get
    // a shape the exclusion-proof compiler can NOT express — Spark
    // trusts listFiles to apply it, so exact evaluation is mandatory
    val odd = df.filter(pmod(col("p"), lit(2)) === 1)
    assert(odd.count() == 300)
    assert(odd.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0 until 600).filter(i => (i % 6) % 2 == 1).map(_.toLong))
    val (sel, tot) = idx.lastPruned.get
    assert(sel < tot, s"expected partition pruning, got $sel/$tot")
    // plain equality prunes to one partition's files
    val one = df.filter(col("p") === 3)
    assert(one.count() == 100)
    val (sel1, _) = idx.lastPruned.get
    assert(sel1 <= tot / 6 + 1, s"p=3 should keep ~1/6 of files, kept $sel1")
    // the filter planned as a PARTITION filter, not a pushed data filter
    val scan = scansOf(df.filter(col("p") === 3)).head
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters on the scan: ${scan.metadata}")
  }

  test("dynamic partition pruning fires on a fact-dim join") {
    val base = mkIntTable()
    val df = SnapshotRelation.read(spark, base, partCol = Some("p")).get
    // file-backed dim: an in-memory LocalRelation would constant-fold
    // its filter away and DPP has no selective filter to latch onto
    val dimPath = Files.createTempDirectory("graft_dppdim").toString
    Seq((0, "keep"), (1, "drop"), (2, "drop"), (3, "drop"),
      (4, "drop"), (5, "drop")).toDF("k", "flag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val q = df.join(dim, df("p") === dim("k")).filter(col("flag") === "keep")
      .agg(count(lit(1)).as("n"), sum("id").as("s"))
    val row = q.collect().head
    assert(row.getLong(0) == 100)
    assert(row.getLong(1) == (0 until 600).filter(_ % 6 == 0).sum)
    val scan = scansOf(
      df.join(dim, df("p") === dim("k")).filter(col("flag") === "keep"))
      .find(_.relation.location.isInstanceOf[SnapshotFileIndex]).get
    val dpp = scan.partitionFilters.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
        .DynamicPruningExpression]))
    assert(dpp, s"expected a dynamic pruning filter on the graft scan: " +
      s"${scan.partitionFilters}")
  }

  test("DML and time travel stay correct on an exposed table") {
    val base = mkIntTable()
    SnapshotLog.deleteWhere(spark, base, expr("p = 2"), "p")
    val df = SnapshotRelation.read(spark, base, partCol = Some("p")).get
    assert(df.count() == 500)
    assert(df.filter(col("p") === 2).count() == 0)
    val v1 = SnapshotRelation.read(spark, base, versionAsOf = Some(1L),
      partCol = Some("p")).get
    assert(v1.count() == 600)
  }

  test("string-date partitions expose; timestamp types do not") {
    val base = Files.createTempDirectory("graft_dppd").toString + "/tbl"
    val df = (0 until 90).map { i =>
      (i.toLong, java.sql.Date.valueOf(f"2024-01-${i % 3 + 1}%02d"), i * 1.0)
    }.toDF("id", "d", "v")
    SnapshotLog.appendBatch(spark, base, df, "d", batchId = 1)
    val (rel, idx) = SnapshotRelation
      .applyWithIndex(spark, base, partCol = Some("d")).get
    assert(idx.partitionSchema.fieldNames.toSeq == Seq("d"))
    assert(rel.filter(col("d") === "2024-01-02").count() == 30)
    assert(rel.collect().toSet ==
      spark.read.parquet(idx.inputFiles: _*).select("id", "d", "v")
        .collect().toSet)

    val baseTs = Files.createTempDirectory("graft_dppts").toString + "/tbl"
    val dfTs = (0 until 30).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + (i % 3) * 86400000L))
    }.toDF("id", "ts")
    SnapshotLog.appendBatch(spark, baseTs, dfTs, "ts", batchId = 1)
    val (relTs, idxTs) = SnapshotRelation
      .applyWithIndex(spark, baseTs, partCol = Some("ts")).get
    assert(idxTs.partitionSchema.isEmpty,
      "timestamp partition columns must not expose (tz-dependent strings)")
    assert(relTs.count() == 30)
  }

  test("unpartitioned tables keep the flat scan") {
    val base = Files.createTempDirectory("graft_dppu").toString + "/tbl"
    val df = (0 until 50).map(i => (i.toLong, s"x$i")).toDF("id", "s")
    SnapshotLog.appendBatch(spark, base, df, SnapshotLog.NoPartCol,
      batchId = 1)
    val (rel, idx) = SnapshotRelation.applyWithIndex(spark, base).get
    assert(idx.partitionSchema.isEmpty)
    assert(rel.count() == 50)
  }

  test("manifest-stamped layout exposes without a caller hint") {
    val base = mkIntTable()
    val bp = new Path(base)
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    SnapshotLog.setProperties(spark, base,
      Map(SnapshotLog.PartColProp -> "p"))
    val (_, idx) = SnapshotRelation.applyWithIndex(spark, base).get
    assert(idx.partitionSchema.fieldNames.toSeq == Seq("p"))
    assert(fs.exists(bp))
  }
}
