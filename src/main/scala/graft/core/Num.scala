package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact-decimal aggregation helpers.
  *
  * Floating-point addition is not associative, so a distributed SUM over a
  * DOUBLE column is nondeterministic: the result depends on partition count
  * and merge order, which breaks both reproducibility and oracle
  * verification. Summing in DECIMAL is exact and therefore
  * order-independent — the same query yields bit-identical results on 32
  * or 32,000 partitions. Scale choice: inputs in the corpus carry at most
  * a few decimal digits; DECIMAL(38,4)/(38,8) keeps 30+ integer digits of
  * headroom, enough for 100 TB-scale sums without overflow.
  *
  * The deterministic pattern for derived stats: do the exact sum in
  * decimal, cast once to DOUBLE (deterministic round-to-nearest-even),
  * then apply scalar IEEE ops (division, sqrt) which are correctly
  * rounded and engine-independent.
  */
object Num {
  /** Cast to exact decimal for order-independent aggregation. */
  def dec(c: Column, scale: Int = 4): Column = c.cast(DecimalType(38, scale))

  /** Exact decimal SUM. */
  def dsum(c: Column, scale: Int = 4): Column = sum(dec(c, scale))

  /** Exact decimal SUM surfaced as DOUBLE (single deterministic cast). */
  def dsumD(c: Column, scale: Int = 4): Column = dsum(c, scale).cast(DoubleType)

  /** Deterministic mean: exact decimal sum → double, / count. */
  def davgD(c: Column, scale: Int = 4): Column =
    dsum(c, scale).cast(DoubleType) / count(lit(1))
}
