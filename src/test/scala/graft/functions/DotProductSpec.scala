package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("codegen dot product is bit-identical to the composable left fold") {
    val rnd = new Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    GraftFunctions.register(spark)
    val fold = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val out = df.select(
      GraftFunctions.dot(col("a"), col("b")).as("native"),
      fold.as("composed")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        == java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null arrays propagate null") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(GraftFunctions.dot(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("works in SQL text and in interpreted (non-codegen) mode") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1d, 2d, 3d), array(4d, 5d, 6d)) v")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
    // interpreted path: eval via filter pushed to a non-codegen context
    withSQLConf("spark.sql.codegen.wholeStage" -> "false") {
      val r2 = spark.sql("SELECT graft_dot(array(1d, 2d), array(3d, 4d)) v")
        .collect()(0).getDouble(0)
      assert(r2 == 11.0)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
