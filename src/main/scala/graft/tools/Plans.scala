package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.Registry

/** Dump `.explain("formatted")` for registered queries to files — the
  * plan-evidence artifacts for optimization rounds (plans/rNN/).
  *
  * Usage: runMain graft.tools.Plans <outDir> <suffix> <q1,q2,...> [sfDir]
  * Writes <outDir>/<query>_<suffix>.txt per query. The plan is the
  * pre-execution formatted plan plus, after a noop-sink run, the
  * AQE-final executed plan (the shape the guards assert on).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val q = Registry.byName(n)
      try {
        val df = q.build(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        df.write.mode("overwrite").format("noop").save()
        val finalPlan = df.queryExecution.executedPlan.toString
        val txt = s"== $n ($suffix) ==\n\n--- explain(formatted) ---\n" +
          formatted + "\n--- AQE-final executed plan ---\n" + finalPlan
        Files.write(Paths.get(s"$outDir/${n}_$suffix.txt"),
          txt.getBytes(StandardCharsets.UTF_8))
        println(s"[plans] wrote $outDir/${n}_$suffix.txt")
      } catch {
        case e: Throwable => println(s"[plans] $n FAILED: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
