package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Caching

/** Exact GLOBAL cumulative sum without the single-partition window.
  *
  * `Window.orderBy(k)` with no partition key plans a `SinglePartition`
  * exchange — every row through one task, the classic 100 TB
  * serialization cliff. The distributed form is the textbook two-phase
  * prefix sum:
  *
  *   1. range-partition by the order key (partition p holds a
  *      contiguous key range, ranges ascend with the partition id);
  *   2. per-partition PARTIAL sums collect to the driver —
  *      O(partitions) rows, metadata not data (the IvfIndex-centroid
  *      pattern) — and an exclusive scan turns them into per-partition
  *      offsets;
  *   3. each partition runs its LOCAL cumulative window (parallel
  *      across partitions) and adds its offset.
  *
  * The input is persisted for the two passes so the range boundaries
  * (and therefore the partition ids the offsets are keyed by) are
  * computed once. Result is bit-identical to the single-partition
  * window for any associative exact sum (BIGINT here) — PrefixSumSpec
  * asserts equality and that the plan contains no SinglePartition
  * exchange. */
object PrefixSum {

  /** Adds `out` = cumulative sum of BIGINT column `valueCol` in
    * `orderCol` order (order values must be globally unique). */
  def cumsum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      out: String,
      partitions: Int = 32): DataFrame = {
    val pid = "__ps_pid"
    val ranged = Caching.cached(
      df.repartitionByRange(partitions, col(orderCol))
        .withColumn(pid, spark_partition_id()))
    // O(partitions) driver-side offsets — exclusive scan of the
    // partial sums in partition-id (= key-range) order. The same pass
    // ENFORCES the precondition (free: range-partitioning co-locates
    // equal keys, so per-partition null/dup counts see every
    // violation): NULL or duplicate order keys make "cumulative in
    // orderCol order" ambiguous — fail loudly, not silently. coalesce:
    // a partition whose every value is NULL sums to SQL NULL, which is
    // an offset contribution of 0, not an NPE.
    val partials = ranged.groupBy(col(pid))
      .agg(
        coalesce(sum(col(valueCol)), lit(0L)).as("__ps_sum"),
        count(when(col(orderCol).isNull, 1)).as("__ps_nulls"),
        (count(col(orderCol)) - count_distinct(col(orderCol))).as("__ps_dups"))
      .collect()
      .map { r =>
        require(r.getLong(2) == 0L,
          s"PrefixSum: NULL values in order column '$orderCol'")
        require(r.getLong(3) == 0L,
          s"PrefixSum: duplicate values in order column '$orderCol'")
        r.getInt(0) -> r.getLong(1)
      }.sortBy(_._1)
    val offsets: Map[Int, Long] = partials
      .scanLeft((-1, 0L)) { case ((_, acc), (p, s)) => (p, acc + s) }
      .sliding(2).collect { case Array((_, off), (p, _)) => p -> off }
      .toMap
    val w = Window.partitionBy(col(pid)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn(out,
        sum(col(valueCol)).over(w) +
          coalesce(element_at(typedLit(offsets), col(pid)), lit(0L)))
      .drop(pid)
  }
}
