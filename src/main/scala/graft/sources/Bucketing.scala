package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time, join forever
  * without exchanges.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is shuffling both
  * sides. Writing both tables bucketed (and sorted) by the join key makes
  * every subsequent join on that key exchange-free: Spark matches the
  * bucket spec to the required hash partitioning and plans a SortMergeJoin
  * directly over co-located buckets. The shuffle is paid once, at
  * ingestion, amortized over every downstream query.
  *
  * (Catalog-backed: bucketing metadata lives in the session catalog, so
  * these write `saveAsTable` — the reference's Glue-crawler catalog role,
  * SURVEY.md §2.1 S6, re-expressed as Spark-native tables.)
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table on `key`. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — exchange-free when
    * both were written with the same bucket count. */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
