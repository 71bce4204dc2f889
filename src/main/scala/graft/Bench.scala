package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Each query is forced end-to-end with a noop sink (full column
  * materialization — `count()` would let Catalyst prune most of the
  * plan). One untimed warmup pass amortizes JIT/codegen compilation so
  * the numbers reflect steady-state throughput.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headliners = Registry.all.filter(_.headline)
    def run(q: Q): Unit =
      q.build(spark, sfDir).write.mode("overwrite").format("noop").save()

    headliners.foreach(q => try run(q) catch { case _: Throwable => () }) // warmup
    // Best-of-4, sampled round-robin ACROSS queries: this host shares CPU
    // with external load (observed loadavg spikes >20, minutes long), so
    // back-to-back samples of one query can all land inside a noise
    // window — round 1 recorded 29.9s for a query that runs in 1.3s warm,
    // round 2 a 5.9s sample of a 1.2s query. Interleaving means a noise
    // window inflates one full pass, and the per-query min is taken
    // across passes spread over the whole run.
    val samples = (1 to 4).map { _ =>
      headliners.map { q =>
        val t0 = System.nanoTime()
        try { run(q); (System.nanoTime() - t0) / 1e9 } catch { case _: Throwable => -1.0 }
      }
    }
    val results = headliners.zipWithIndex.map { case (q, i) =>
      val qs = samples.map(_(i)).filter(_ >= 0)
      q.name -> (if (qs.isEmpty) -1.0 else qs.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
