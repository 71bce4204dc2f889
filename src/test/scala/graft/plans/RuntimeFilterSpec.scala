package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Runtime bloom-filter join pruning — the 100 TB shuffle-join path.
  *
  * When a dim side is too big to broadcast (so q19's broadcast plan is
  * off the table) but carries a selective predicate, Catalyst's
  * InjectRuntimeFilter can build a bloom filter from the filtered keys
  * and semi-join-reduce the fact side BEFORE its shuffle — the shuffle
  * then carries only probably-matching rows. This spec proves the
  * engine's sessions have the capability wired: with broadcast disabled
  * and the size thresholds scaled down to the test corpus (defaults
  * gate on 10 GB application-side scans), the optimized plan contains
  * the `might_contain` runtime filter on the fact scan.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val confs = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")

  test("selective shuffle join gets a bloom runtime filter on the fact side") {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables(spark, sfDir, "lineitem")
      val or = Tables(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(or, li("l_orderkey") === or("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom runtime filter in:\n$optimized")
      // and it still computes the right thing
      assert(joined.collect().head.getLong(1) > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
