package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Two-stage salted aggregation for extreme key skew.
  *
  * A plain `groupBy(key).agg(sum)` sends every row of a hot key to one
  * reducer. Salting spreads each key over `salts` sub-groups first
  * (phase 1: groupBy(key, salt) — map-side partial agg still applies),
  * then combines the sub-aggregates (phase 2: groupBy(key) over ≤
  * |keys|·salts tiny rows). Correct for any algebraic aggregate; sums run
  * in exact decimal so the regrouping is order-insensitive and the result
  * is bit-identical to the unsalted plan.
  *
  * The salt is `spark_partition_id() mod salts` — free to compute, no
  * extra shuffle key material, and naturally spreads whatever partitions
  * the hot key occupies. (AQE's skew-join splitting covers joins; this
  * covers aggregations, where AQE does not re-split a hot group.)
  */
object SaltedAgg {

  /** Exact per-key COUNT and decimal SUM under skew. */
  def sumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      salts: Int = 16,
      scale: Int = 4): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    df
      .withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(
        sum(col(valueCol).cast(DecimalType(38, scale))).as("__psum"),
        count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(
        sum(col("__psum")).as("__sum"),
        sum(col("__pcnt")).as("n_rows"))
      .withColumn("total", col("__sum").cast(DoubleType))
      .drop("__sum")
  }
}
