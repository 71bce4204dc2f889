package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe equi-join: when one join key is hot, a plain shuffle join
  * sends every row of that key to ONE reducer — the straggler that
  * dominates wall-clock at 100 TB. Salting splits each left key across
  * `salts` sub-keys and replicates the right side once per salt, so the
  * hot key's probe work spreads over `salts` tasks.
  *
  * The result is bag-identical to the plain join: each left row carries
  * exactly one salt, and the right side is replicated across ALL salts,
  * so every (left, right) match survives exactly once.
  *
  * Use when the LEFT side is large with skewed keys and the RIGHT side
  * is modest (its shuffle volume grows ×salts). For dims small enough
  * to broadcast, prefer `broadcast()` — no shuffle at all; this
  * operator covers the middle ground (right side too big to broadcast,
  * left side skewed). AQE's skew-join handles the same problem
  * reactively when statistics surface it; salting is the explicit,
  * planable form.
  *
  * Ref anchor: the reference pins its one join to a broadcast for the
  * same skew-avoidance reason (`glue_jobs/etl_job.py:68-71`).
  */
object SaltedJoin {

  /** Inner equi-join of `left` and `right` on `keys`, left side salted
    * into `salts` sub-keys. The salt is derived from the full left row
    * hash — deterministic, and varying within a hot key. */
  def inner(left: DataFrame, right: DataFrame, keys: Seq[String], salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val l = left.withColumn(
      "__salt", pmod(hash(left.columns.map(col).toSeq: _*), lit(salts)))
    val r = right.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
