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

  /** Exact net price: price × (1 − rate), factors cast to NARROW exact
    * decimals BEFORE the multiply. Casting the double *product* to
    * decimal is engine-divergent at scale: the product's binary error
    * (~half-ulp, ≈4e-12 at 1e4 magnitude) straddles the 1e-8 decimal
    * grid often enough that Spark (rounds the shortest string repr) and
    * DuckDB (rounds the exact binary) disagree on ~1e-4 of rows —
    * invisible at sf0.01, a hash mismatch at sf0.1. The FACTORS are
    * 2-dp money/rate values whose binary error (≪ grid) can't reach a
    * boundary, so their casts agree everywhere and the decimal multiply
    * is exact: DECIMAL(18,4) × (1 − DECIMAL(8,6)) → DECIMAL(28,10),
    * within both engines' 38-digit exact range.
    * Oracle form: CAST(price AS DECIMAL(18,4)) *
    * (CAST(1 AS DECIMAL(8,6)) - CAST(rate AS DECIMAL(8,6))).
    *
    * Surfacing a netD SUM as DOUBLE: rescale to DECIMAL(38,4) FIRST.
    * The (·,10)-scaled sum's integer form exceeds 2^53, and DuckDB's
    * decimal→double cast converts the int128 to double BEFORE dividing
    * — not correctly rounded (Spark's BigDecimal path is), so the final
    * doubles disagree in the last bit on ~unlucky group sums. At scale
    * 4 the integer form stays under 2^53 for corpus-scale sums and both
    * engines' casts are exact. */
  def netD(price: Column, rate: Column): Column =
    price.cast(DecimalType(18, 4)) *
      (lit(1).cast(DecimalType(8, 6)) - rate.cast(DecimalType(8, 6)))

  /** Scaled-long exact money sum — the vectorizable alternative to
    * decimal aggregation for fixed-point inputs: `round(x·10^scale)`
    * summed as a primitive LONG. Same exactness/order-independence as
    * [[dsum]] (integer addition is associative), but the partial
    * aggregate is a primitive in Tungsten's hash map instead of a
    * 16-byte Decimal with per-row object arithmetic — the fast path for
    * the hottest money rollups.
    *
    * Contract: inputs carry at most `scale` decimal digits (money), and
    * group sums stay under 2^63/10^scale (9.2×10^16 at cents) — with
    * ANSI on, overflow throws rather than wrapping. Surfaced as DOUBLE
    * via [[lsumD]], the result is BIT-IDENTICAL to [[dsumD]] while the
    * scaled sum is under 2^53 (the long→double cast is then exact and
    * the ÷10^scale is correctly rounded — one rounding, same as the
    * decimal path; ScaledLongSumSpec proves equality on the corpus). */
  def lsum(c: Column, scale: Int = 2): Column =
    sum(round(c * math.pow(10, scale), 0).cast(LongType))

  /** Scaled-long exact SUM surfaced as DOUBLE; equals [[dsumD]] on
    * in-contract inputs. */
  def lsumD(c: Column, scale: Int = 2): Column =
    lsum(c, scale).cast(DoubleType) / math.pow(10, scale)
}
