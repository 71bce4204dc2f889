package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Registry

/** Print one registered query's result rows (head 50) — the quick
  * "did the graded booleans actually come out TRUE" check.
  *
  * Usage: runMain graft.tools.Show <query_name> [sfDir]
  */
object Show {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.byName(name).build(spark, sfDir).show(50, truncate = false)
    spark.stop()
  }
}
