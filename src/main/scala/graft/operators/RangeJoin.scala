package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-proximity range join without an equi key, via bucketing.
  *
  * The naive formulation — `a JOIN b ON abs(a.ts − b.ts) <= tol` — has no
  * equi conjunct, so Spark plans a BroadcastNestedLoopJoin: O(|A|·|B|)
  * comparisons, unusable at scale. Bucketing restores a hash join: rows
  * land in `floor(ts / tol)` buckets, and any qualifying pair is at most
  * one bucket apart, so probing buckets {b−1, b, b+1} (a bounded 3×
  * explode of ONE side) plus the exact residual filter finds every pair
  * exactly once — each pair matches on the single bucket the build row
  * owns.
  *
  * Scale: one shuffle keyed on bucket; fan-out is a constant 3×. Skew
  * concentrates where real pair density is quadratic (unavoidable —
  * that's the output size); AQE skew-join splits oversized buckets.
  */
object RangeJoin {

  /** Self-join: pairs of rows within `toleranceMs`, `idCol`-ordered to
    * emit each unordered pair once. Output: (id_a, id_b, delta_ms). */
  def proximityPairs(
      df: DataFrame,
      idCol: String,
      tsCol: String,
      toleranceMs: Long): DataFrame = {
    val withBucket = df.select(
      col(idCol).as("__id"),
      unix_millis(col(tsCol)).as("__ms"),
      floor(unix_millis(col(tsCol)) / toleranceMs).as("__bucket"))
    val probe = withBucket.select(
      col("__id").as("id_a"), col("__ms").as("ms_a"),
      explode(array(
        col("__bucket") - 1, col("__bucket"), col("__bucket") + 1)).as("__jb"))
    val build = withBucket.select(
      col("__id").as("id_b"), col("__ms").as("ms_b"), col("__bucket").as("__jb"))
    probe.join(build,
        probe("__jb") === build("__jb") &&
          col("id_a") < col("id_b") &&
          abs(col("ms_a") - col("ms_b")) <= toleranceMs)
      .select(col("id_a"), col("id_b"), (col("ms_b") - col("ms_a")).as("delta_ms"))
  }
}
