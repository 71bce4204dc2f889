package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the TPC-H-ish test corpus (TESTDATA.md).
  *
  * Scans are plain `spark.read.parquet` so Catalyst's FileSourceStrategy
  * gives us column pruning + predicate pushdown for free; at cluster scale
  * the same call reads a partitioned directory tree and prunes partitions.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark rejects outright
    // (PARQUET_TYPE_ILLEGAL). Read it as a long of epoch-nanos and convert
    // to a microsecond timestamp — lossless here (corpus carries no sub-µs
    // components) and identical to DuckDB's ns→µs cast.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
