package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.Tables

class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def vecs = Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))

  test("fused cosine is bit-identical to the composed dot/(sqrt*sqrt) form") {
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      GraftFunctions.dot(a, b)
    val q = vecs.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val both = vecs.crossJoin(broadcast(q)).select(
      GraftFunctions.cosine(col("v"), col("qv")).as("fused"),
      (dot(col("v"), col("qv")) /
        (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("qv"), col("qv"))))).as("composed"))
    val diffs = both.filter(
      col("fused") =!= col("composed") ||
        col("fused").isNull =!= col("composed").isNull).count()
    assert(diffs == 0)
    // bitwise, not just ==: compare raw long bits too
    val bits = both.select(
      expr("sum(case when cast(fused as string) <> cast(composed as string) then 1 else 0 end)"))
      .collect()(0).getLong(0)
    assert(bits == 0)
  }

  test("null array and null element both yield null") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(3.0, 4.0)))).toDF("a", "b")
      .select(GraftFunctions.cosine(col("a"), col("b")).as("c"))
    val got = df.collect().map(r => Option(r.get(0)))
    assert(got(0).isDefined && got(1).isEmpty)

    val withNullElem = spark.sql(
      "SELECT graft_cosine(array(1.0d, cast(null as double)), array(1.0d, 2.0d)) AS c")
    assert(withNullElem.collect()(0).isNullAt(0))
  }

  test("works in SQL text and in interpreted (non-codegen) mode") {
    val sqlRes = spark.sql(
      "SELECT graft_cosine(array(1d,0d), array(1d,0d)) AS c").collect()(0).getDouble(0)
    assert(sqlRes == 1.0)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val r = spark.sql(
        "SELECT graft_cosine(array(3d,4d), array(4d,3d)) AS c").collect()(0).getDouble(0)
      assert(math.abs(r - 24.0 / 25.0) < 1e-15)
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
