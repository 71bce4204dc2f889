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
    val decompose = args.contains("--decompose")
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
        if (decompose) {
          // Floor decomposition (round-14 verdict item 8): where does a
          // small query's ~1s wall go? Phases, each timed cold in a
          // fresh Dataset so earlier phases aren't amortized away:
          //   build   — DataFrame construction + analysis (resolution)
          //   plan    — optimization + physical planning + AQE prep
          //             (forcing executedPlan)
          //   first   — first noop execution: codegen compile + stage
          //             scheduling + execute
          //   warm×3  — repeat executions of the SAME Dataset (codegen
          //             cache hit): the irreducible execute floor Bench
          //             reports via min-of-passes
          // first − warm ≈ codegen+setup; warm ≈ scan+shuffle+task
          // overhead. Three cold repetitions to see variance.
          (1 to 3).foreach { rep =>
            val t0 = System.nanoTime()
            val df = q.build(spark, sfDir)
            val tBuild = (System.nanoTime() - t0) / 1e6
            val t1 = System.nanoTime()
            df.queryExecution.executedPlan // force analyze+optimize+plan
            val tPlan = (System.nanoTime() - t1) / 1e6
            val t2 = System.nanoTime()
            df.write.mode("overwrite").format("noop").save()
            val tFirst = (System.nanoTime() - t2) / 1e6
            val warm = (1 to 3).map { _ =>
              val t3 = System.nanoTime()
              df.write.mode("overwrite").format("noop").save()
              (System.nanoTime() - t3) / 1e6
            }
            println(f"[decompose] $n rep$rep build=$tBuild%.0fms plan=$tPlan%.0fms " +
              f"first=$tFirst%.0fms warm=${warm.min}%.0fms (${warm.map(w => f"$w%.0f").mkString(",")})")
          }
        } else {
          val df = q.build(spark, sfDir)
          if (explain) df.explain("formatted")
          val runs = if (name == "ALL") 2 else 3
          val times = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            df.write.mode("overwrite").format("noop").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[probe] $n best: ${times.min}%.2fs  (${times.map(t => f"$t%.2f").mkString(", ")})")
        }
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
