package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Range-clustered layout: sort the data ACROSS files by a clustering
  * key so each output file covers a disjoint key range.
  *
  * Why this matters at 100 TB: parquet footers carry min/max stats per
  * row group, and the scan planner skips files whose range cannot match
  * a predicate. Hash-partitioned or unordered writes spread every key
  * over every file — stats cover everything, nothing skips. Range
  * clustering makes `WHERE key BETWEEN a AND b` touch only the files
  * whose range overlaps [a, b]: I/O proportional to selectivity, like
  * partition pruning but for columns too high-cardinality to be
  * directory partitions (user ids, timestamps at sub-day grain).
  *
  * `repartitionByRange` samples the key distribution, so files are also
  * size-balanced under skew — unlike value-based directory partitioning,
  * which gives hot keys giant files.
  */
object Clustering {

  /** Write `df` range-clustered on `key` into `nFiles` files, each
    * sorted internally (row-group stats stay tight within the file). */
  def writeRangeClustered(
      df: DataFrame,
      path: String,
      key: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(key))
      .sortWithinPartitions(col(key))
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
}
