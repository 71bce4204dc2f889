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

  test("full q19 shape on bucketed facts: only the final agg exchanges") {
    // the q19_region_revenue plan at 100 TB: lineitem⋈orders is the one
    // shuffle — pre-bucketing both facts on the order key removes it,
    // leaving broadcast dim joins + the (tiny) group-by exchange
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS bq_orders")
      spark.sql("DROP TABLE IF EXISTS bq_lineitem")
      Bucketing.writeBucketed(
        Tables(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
        "bq_orders", "o_orderkey", 4)
      Bucketing.writeBucketed(
        Tables(spark, sfDir, "lineitem")
          .select(col("l_orderkey").as("o_orderkey"),
            col("l_extendedprice"), col("l_discount")),
        "bq_lineitem", "o_orderkey", 4)

      val c = Tables(spark, sfDir, "customer")
      val n = Tables(spark, sfDir, "nation")
      val joined = spark.table("bq_lineitem")
        .join(spark.table("bq_orders"), "o_orderkey")
        .join(broadcast(c), col("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(graft.core.Num.netD(col("l_extendedprice"), col("l_discount")))
          .cast(org.apache.spark.sql.types.DoubleType).as("revenue"))
      joined.count()
      // broadcasts are free by design here — count only SHUFFLE exchanges
      val shuffles = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }.size
      assert(shuffles == 1,
        s"bucketed q19 shape must shuffle only for the agg, found $shuffles:\n" +
          joined.queryExecution.executedPlan)

      // same revenue as the unbucketed plan (decimal sums are exact)
      val li = Tables(spark, sfDir, "lineitem")
      val o = Tables(spark, sfDir, "orders")
      val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(graft.core.Num.netD(col("l_extendedprice"), col("l_discount")))
          .cast(org.apache.spark.sql.types.DoubleType).as("revenue"))
      val a = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val b = plain.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(a == b)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
