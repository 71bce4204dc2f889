package graft.sources

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class BucketingSpec extends SparkSpec {

  private def countExchanges(plan: SparkPlan): Int = {
    val normalized = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    normalized.collect { case e: Exchange => e }.size
  }

  test("join of co-bucketed tables plans no shuffle exchange; results match") {
    // force the non-broadcast path: bucketing matters exactly when both
    // sides are too big to broadcast
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try runScenario()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  private def runScenario(): Unit = {
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(li, "b_lineitem", "o_orderkey", 4)

    val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    joined.count() // materialize so AQE finalizes the plan
    val exchanges = countExchanges(joined.queryExecution.executedPlan)
    assert(exchanges == 0,
      s"bucketed join must be exchange-free, found $exchanges:\n${joined.queryExecution.executedPlan}")

    // same result as the plain (shuffling) join
    val plain = o.join(li, "o_orderkey")
    assert(joined.count() == plain.count())

    // and the plain join DOES shuffle — the bucketing removed real work
    plain.count()
    assert(countExchanges(plain.queryExecution.executedPlan) > 0)
  }
}
