package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway expression-cost experiments (not part of the registry). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.core.Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("l_quantity"), col("l_returnflag"))
    li.write.mode("overwrite").format("noop").save() // warm

    def time(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name best=${ts.min}%.3f (${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    time("baseline_project", li.select(col("l_orderkey"), col("l_linenumber")))
    time("try_divide_zero", li.select(col("l_orderkey"),
      expr("try_divide(cast(l_extendedprice as double), cast(l_quantity - l_quantity as double))")))
    time("try_divide_ok", li.select(col("l_orderkey"),
      expr("try_divide(cast(l_extendedprice as double), cast(l_quantity as double))")))
    time("try_add_overflow", li.select(col("l_orderkey"),
      expr("try_add(9223372036854775807L, l_orderkey)")))
    time("try_cast_bad", li.select(col("l_orderkey"),
      expr("try_cast(concat('x', l_returnflag) as bigint)")))
    time("case_overflow_equiv", li.select(col("l_orderkey"),
      when(col("l_orderkey") > 0, lit(null).cast("bigint"))
        .otherwise(lit(Long.MaxValue) + col("l_orderkey"))))
    spark.stop()
  }
}
