package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Proof that the day-partitioned layout actually prunes at read time —
  * the property the reference's `partitionBy("fecha_dia")` sink exists
  * for (`glue_jobs/etl_job.py:130-132`) and the one that matters most at
  * 100 TB: a day-filtered query must touch 1/‖days‖ of the files, not
  * scan-and-discard. */
class ScanPruningSpec extends SparkSpec {

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect() // execute so AQE finalizes and metrics populate
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect { case s: FileSourceScanExec => s } ++
      (plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
        .flatMap(_.collect { case s: FileSourceScanExec => s }))
    assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$plan")
    scans.head
  }

  test("partition filter prunes day directories at the scan") {
    val dir = Files.createTempDirectory("graft_prune").toString + "/bydate"
    val events = Tables(spark, sfDir, "events")
      .withColumn("event_day", to_date(col("ts")))
    events.write.mode("overwrite").partitionBy("event_day").parquet(dir)

    val days = events.select("event_day").distinct().count()
    assert(days > 5, s"need a multi-day corpus, got $days")
    val oneDay = events.select(max(col("event_day"))).collect()(0).getDate(0)

    val filtered = spark.read.parquet(dir).filter(col("event_day") === lit(oneDay))
    val scan = scanOf(filtered)
    assert(scan.partitionFilters.nonEmpty, "filter must classify as a partition filter")
    val filesRead = scan.metrics("numFiles").value
    val allFiles = scanOf(spark.read.parquet(dir)).metrics("numFiles").value
    assert(filesRead < allFiles / 2,
      s"pruned scan read $filesRead of $allFiles files — pruning not effective")
  }

  test("non-partition filters push down to parquet, partition columns don't bloat ReadSchema") {
    val dir = Files.createTempDirectory("graft_prune2").toString + "/bydate"
    Tables(spark, sfDir, "events")
      .withColumn("event_day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_day").parquet(dir)

    val q = spark.read.parquet(dir)
      .filter(col("event_type") === "view")
      .select("event_id", "event_type")
    val scan = scanOf(q)
    assert(scan.dataFilters.nonEmpty, "event_type filter should be a data filter")
    assert(scan.metadata("PushedFilters").contains("EqualTo(event_type,view)"),
      s"expected pushed filter, got ${scan.metadata("PushedFilters")}")
    val readCols = scan.requiredSchema.fieldNames.toSet
    assert(readCols == Set("event_id", "event_type"),
      s"column pruning failed: read $readCols")
  }
}
