package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.Tables

class SaltedAggSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation is bit-identical to the plain plan, any salt count") {
    val events = Tables(spark, sfDir, "events")
    val plain = events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("value").cast(DecimalType(38, 4))).cast(DoubleType).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    Seq(1, 4, 64).foreach { salts =>
      val salted = SaltedAgg.sumCount(events, Seq("event_type"), "value", salts)
        .select(col("event_type"), col("n_rows"), col("total"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(salted == plain, s"mismatch at salts=$salts")
    }
  }

  test("HLL approx distinct stays within 5% of exact on the corpus") {
    val events = Tables(spark, sfDir, "events")
    val joined = events.groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .collect()
    joined.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
