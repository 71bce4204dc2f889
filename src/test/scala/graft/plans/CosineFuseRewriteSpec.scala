package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

class CosineFuseRewriteSpec extends SparkSpec {

  private lazy val ext: SparkSession = graft.GraftSessions.withExtensions(spark)

  test("composed cosine fuses into graft_cosine") {
    import ext.implicits._
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      GraftFunctions.dot(a, b)
    val df = Seq((Seq(1.0, 2.0), Seq(2.0, 1.0)), (Seq(1.0, 0.0), Seq(0.0, 1.0)))
      .toDF("a", "b")
      .repartition(1)
      .select((dot(col("a"), col("b")) /
        (sqrt(dot(col("a"), col("a"))) * sqrt(dot(col("b"), col("b"))))).as("sim"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_cosine"), s"fusion did not fire:\n$optimized")
    val got = df.collect().map(_.getDouble(0)).sorted
    assert(got(0) == 0.0 && math.abs(got(1) - 0.8) < 1e-15)
  }

  test("norm factors in swapped order still fuse (commutative multiply)") {
    import ext.implicits._
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      GraftFunctions.dot(a, b)
    val df = Seq((Seq(3.0, 4.0), Seq(4.0, 3.0))).toDF("a", "b")
      .repartition(1)
      .select((dot(col("a"), col("b")) /
        (sqrt(dot(col("b"), col("b"))) * sqrt(dot(col("a"), col("a"))))).as("sim"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_cosine"))
    assert(math.abs(df.collect()(0).getDouble(0) - 24.0 / 25.0) < 1e-15)
  }

  test("mismatched operands do NOT fuse") {
    import ext.implicits._
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      GraftFunctions.dot(a, b)
    // denominator uses (a,a) twice — not the cosine of (a,b)
    val df = Seq((Seq(1.0, 2.0), Seq(2.0, 1.0))).toDF("a", "b")
      .repartition(1)
      .select((dot(col("a"), col("b")) /
        (sqrt(dot(col("a"), col("a"))) * sqrt(dot(col("a"), col("a"))))).as("x"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_cosine"))
  }

  test("fused value is bit-identical to the composed evaluation") {
    import ext.implicits._
    val data = Seq.tabulate(40)(i =>
      (Seq.tabulate(16)(j => (i * 13 + j) / 7.0 - 1.0),
        Seq.tabulate(16)(j => (i * 5 + 2 * j) / 11.0 - 0.5)))
    def cosRef(a: Seq[Double], b: Seq[Double]): Double = {
      val ab = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      val aa = a.foldLeft(0.0)((acc, x) => acc + x * x)
      val bb = b.foldLeft(0.0)((acc, x) => acc + x * x)
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      GraftFunctions.dot(a, b)
    val got = data.toDF("a", "b").repartition(1)
      .select((dot(col("a"), col("b")) /
        (sqrt(dot(col("a"), col("a"))) * sqrt(dot(col("b"), col("b"))))).as("sim"))
      .collect().map(_.getDouble(0)).toSeq
    got.zip(data.map { case (a, b) => cosRef(a, b) }).foreach { case (g, r) =>
      assert(java.lang.Double.doubleToLongBits(g) == java.lang.Double.doubleToLongBits(r))
    }
  }
}
