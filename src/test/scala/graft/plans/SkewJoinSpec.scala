package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join handling — the runtime complement to the explicit
  * salting operators (q34 SaltedAgg / q49 SaltedJoin): when a shuffle
  * join's partition sizes are lopsided, OptimizeSkewedJoin splits the
  * oversized partitions at runtime and replicates the matching side —
  * no code change, no pre-known hot keys. The salting ops remain the
  * deterministic-output path (AQE splitting doesn't help aggregations
  * with one giant GROUP BY key on the map side); this spec pins that
  * the runtime path actually engages on this engine's sessions.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val confs = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")

  test("AQE splits a skewed shuffle-join partition at runtime") {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying ~100k rows vs 1 row for every other key
      val left = spark.range(0, 100000)
        .select(when(col("id") < 99000, 7L).otherwise(col("id")).as("k"),
          concat(lit("payload-"), col("id")).as("s"))
      val right = spark.range(0, 2000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      // drive THIS DataFrame's own QueryExecution (count() would plan a
      // separate aggregate query and leave this one un-executed)
      assert(joined.collect().length == 99000) // only hot key 7 matches 0..1999

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to engage:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
