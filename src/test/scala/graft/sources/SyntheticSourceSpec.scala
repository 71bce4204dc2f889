package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SyntheticSourceSpec extends SparkSpec {

  private def read(rows: Long = 1000, parts: Int = 8): DataFrame =
    spark.read.format("graft.sources.SyntheticEventsSource")
      .option("rows", rows).option("partitions", parts).load()

  test("produces deterministic rows: same content on different partitionings") {
    val a = read(parts = 2).collect().map(_.toSeq).toSet
    val b = read(parts = 7).collect().map(_.toSeq).toSet
    assert(a == b && a.size == 1000)
  }

  test("id-range filters prune InputPartitions at plan time") {
    val all = read(rows = 1000, parts = 8)
    assert(all.rdd.getNumPartitions == 8)
    // ids 0..999 over 8 partitions of 125: [250, 300) touches partition 2 only
    val pruned = read(rows = 1000, parts = 8)
      .filter(col("id") >= 250L && col("id") < 300L)
    assert(pruned.rdd.getNumPartitions == 1,
      s"expected 1 planned partition, got ${pruned.rdd.getNumPartitions}")
    assert(pruned.count() == 50)
  }

  test("pushed id filters leave no residual; non-id filters stay above the scan") {
    val qe = read().filter(col("id") < 10L).queryExecution
    // absorbed into the scan: no FilterExec node remains ("Filter (" is
    // the exec node rendering; "PushedFilters: [" is the scan description)
    assert(!qe.executedPlan.toString.contains("Filter ("),
      s"pushed filter must not be re-evaluated:\n${qe.executedPlan}")
    assert(qe.executedPlan.toString.contains("PushedFilters: [LessThan(id,10)]"),
      qe.executedPlan.toString)
    val residual = read().filter(col("value") > 50.0)
    assert(residual.queryExecution.executedPlan.toString.contains("Filter ("),
      "value predicate must be evaluated above the scan")
    assert(residual.count() > 0)
  }

  test("column pruning reaches the reader (scan output is the projection)") {
    val df = read().select("id", "user_id")
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("id#") && scanLine.contains("user_id#"), scanLine)
    assert(!scanLine.contains("value#") && !scanLine.contains("ts#"),
      s"unrequested columns must not reach the reader: $scanLine")
    assert(df.collect().length == 1000)
  }

  test("a pushed equality turns the scan into a single-row single-partition read") {
    val one = read(rows = 100000, parts = 32).filter(col("id") === 77777L)
    assert(one.rdd.getNumPartitions == 1)
    val row = one.collect().head
    assert(row.getLong(0) == 77777L)
  }

  test("Long.MaxValue bounds don't overflow: saturating pushdown stays correct") {
    // id <= MaxValue is vacuously true — must return ALL rows (the old
    // hi.min(v+1) wrapped negative and silently returned an empty scan
    // with the filter still reported as fully pushed)
    val le = read().filter(col("id") <= Long.MaxValue)
    assert(le.count() == 1000, "id <= Long.MaxValue must keep every row")
    assert(le.queryExecution.executedPlan.toString.contains("PushedFilters: ["),
      "filter must still be pushed")
    // id = MaxValue matches nothing (ids < rows <= MaxValue)
    assert(read().filter(col("id") === Long.MaxValue).count() == 0)
    // id > MaxValue matches nothing (lo.max(v+1) used to wrap and keep all)
    assert(read().filter(col("id") > Long.MaxValue).count() == 0)
    // id >= MaxValue: no overflow path, still empty
    assert(read().filter(col("id") >= Long.MaxValue).count() == 0)
    // combined with a real bound the saturated filter stays a no-op
    val both = read().filter(col("id") <= Long.MaxValue && col("id") < 10L)
    assert(both.count() == 10)
  }
}
