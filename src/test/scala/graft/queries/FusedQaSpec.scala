package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec}

/** q115 is only worth having if its fusion is lossless: each grouping
  * level must be row-identical to the standalone query it absorbs, and
  * the whole thing must cost ONE pass over the fact table. */
class FusedQaSpec extends SparkSpec {

  private lazy val fused = Registry.byName("q115_fused_qa").build(spark, sfDir).cache()

  private def assertSame(a: DataFrame, b: DataFrame, what: String): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what slice diverged from the standalone query")
  }

  test("lvl=0 slice is row-identical to q1_pricing_summary") {
    val q1 = Registry.byName("q1_pricing_summary").build(spark, sfDir)
    val detail = fused.filter(col("lvl") === 0)
      .select(q1.columns.map(col).toSeq: _*)
    assertSame(detail, q1, "detail")
  }

  test("lvl=2 slice is row-identical to q5_range_check") {
    val q5 = Registry.byName("q5_range_check").build(spark, sfDir)
    val global = fused.filter(col("lvl") === 2)
      .select(q5.columns.map(col).toSeq: _*)
    assertSame(global, q5, "global")
  }

  test("the fused plan executes exactly one lineitem scan") {
    fused.unpersist(blocking = true) // or the cache satisfies the scan
    val df = Registry.byName("q115_fused_qa").build(spark, sfDir)
    // The r15 partial-cascade form derives its three levels from one
    // shared (rf, ls, pk) exchange: the PRE-execution plan prints that
    // subtree (scan included) once per level, and only AQE's runtime
    // exchange reuse collapses them — so drive the adaptive plan to its
    // final form and assert the scan count THERE (one materialized
    // stage, the other references reused).
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val qe = df.queryExecution
    qe.executedPlan.execute().count() // materializes all AQE stages
    val p = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case o => o.toString
    }
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans == 1, s"expected one executed scan, got $scans:\n$p")
  }
}
