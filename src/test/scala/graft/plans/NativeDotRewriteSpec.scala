package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

class NativeDotRewriteSpec extends SparkSpec {

  private lazy val ext: SparkSession = graft.GraftSessions.withExtensions(spark)

  private def selfDot = aggregate(
    zip_with(col("v"), col("v"), (a, b) => a * b), lit(0.0), (acc, x) => acc + x)

  test("self-dot HOF pattern rewrites to the native expression") {
    import ext.implicits._
    // repartition blocks ConvertToLocalRelation from folding the whole
    // projection at plan time (which would hide the rewrite)
    val df = Seq(Seq(1.0, 2.0, 3.0), Seq(0.5, -0.5)).toDF("v")
      .repartition(1)
      .select(selfDot.as("norm2"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), s"rewrite did not fire:\n$optimized")
    assert(df.collect().map(_.getDouble(0)).toSet == Set(14.0, 0.5))
  }

  test("distinct-argument dot does NOT rewrite (length-mismatch soundness)") {
    import ext.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0, 9.0))).toDF("a", "b")
      .select(aggregate(
        zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_dot"), "unsound rewrite fired on distinct args")
    // zip_with pads with null -> whole fold is null; semantics preserved
    assert(df.collect()(0).isNullAt(0))
  }

  test("null element yields null from the native expression too") {
    import ext.implicits._
    val df = Seq(Seq(Some(1.0), None, Some(3.0))).toDF("v")
      .repartition(1).select(selfDot.as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("bloom functions resolve through the extensions path (SQL text)") {
    import ext.implicits._
    Seq(1L, 2L, 3L, 4L, 5L).toDF("k").createOrReplaceTempView("bloom_keys")
    val hits = ext.sql("""
      SELECT k, graft_might_contain(
               (SELECT graft_bloom_agg(k) FROM bloom_keys WHERE k <= 3), k) AS hit
      FROM bloom_keys""").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // no false negatives, ever (members 1..3 must hit)
    assert(Seq(1L, 2L, 3L).forall(hits(_)), s"bloom false negative: $hits")
  }

  test("rewrite preserves values bit-for-bit vs the strict left fold") {
    import ext.implicits._
    val data = Seq.tabulate(50)(i => Seq.tabulate(16)(j => (i * 17 + j) / 7.0))
    val rewritten = data.toDF("v").select(selfDot.as("d"))
      .collect().map(_.getDouble(0)).toSeq
    val reference = data.map(v => v.foldLeft(0.0)((acc, x) => acc + x * x))
    assert(rewritten.zip(reference).forall { case (a, b) =>
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b) })
  }
}
