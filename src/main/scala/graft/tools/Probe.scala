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

    // "ALL" sweeps every registered query once (warm, after one untimed
    // build+run) and flags the slow tail — the per-round pathology scan.
    // A comma-separated list runs those queries in sequence in ONE
    // session (interference experiments: "d6_ngram_jaccard,q1_...").
    val targets =
      if (name == "ALL") Registry.all.map(_.name)
      else name.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    targets.foreach { n =>
      val q = Registry.byName(n)
      try {
        val df = q.build(spark, sfDir)
        if (explain) df.explain("formatted")
        val runs = if (name == "ALL") 2 else 3
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          df.write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $n best: ${times.min}%.2fs  (${times.map(t => f"$t%.2f").mkString(", ")})")
      } catch {
        case e: Throwable => println(s"[probe] $n FAILED: ${e.getMessage}")
      } finally {
        // ALL = the per-round pathology scan: drop each query's
        // persisted intermediates so a 190-query sweep doesn't carry
        // dead cached plans in storage memory (same hygiene as Verify).
        // Comma-list mode deliberately KEEPS caches — it exists for
        // interference experiments.
        if (name == "ALL") spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
