package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Registry

/** Plan/timing probe for one registered query.
  *
  * Usage: runMain graft.tools.Probe <query_name> [sfDir] [--explain]
  * Times a noop-sink execution (same harness as Bench); with --explain
  * also prints the formatted physical plan.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).filterNot(_.startsWith("--")).getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q = Registry.byName(name)
    val df = q.build(spark, sfDir)
    if (explain) df.explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
