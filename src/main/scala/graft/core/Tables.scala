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

  // Scan-parallelism probe cache: `df.rdd.getNumPartitions` runs full
  // analysis + physical planning on the driver — paying that once per
  // (path, table) instead of on every query build shaves serial driver
  // latency off every multi-table query. File layout per path is stable
  // within a run, so the cached value stays correct.
  private val scanPartsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Scan + the local-corpus rebalance (see below) — the right call for
    * consumers that run per-row compute (regex, array HOFs, vector math)
    * straight off the scan: the rebalance spreads that compute across
    * the session's cores when the corpus ships as one row group. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    load(spark, dir, name,
      rebalance = Some(df => df.repartition(df.sparkSession.sparkContext.defaultParallelism)))

  /** Scan with NO rebalance: for consumers whose first downstream
    * operator is itself an exchange (groupBy/shuffle join/window) or a
    * broadcast join feeding one. There the blanket round-robin
    * repartition is a pure extra shuffle — the decode is serial either
    * way on a single-row-group file, the partial aggregation/map-side
    * join fuses into the scan stage, and the operator's own exchange
    * parallelizes everything downstream. On a real multi-file (100 TB)
    * layout `apply` already skips the rebalance, so `raw` and `apply`
    * plan identically there; locally `raw` is one exchange cheaper. */
  def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    load(spark, dir, name, rebalance = None)

  /** Scan rebalanced BY KEY instead of round-robin: for consumers whose
    * next exchange-requiring operator clusters by `keys` (an equi-join
    * or groupBy on them). The rebalance then *doubles as* that
    * operator's exchange (hash partitioning on a prefix of the
    * clustering keys satisfies its distribution), instead of paying
    * round-robin + the operator's own shuffle back to back. Only keys
    * with enough distinct values to fill the session's cores qualify —
    * a low-cardinality key would skew the rebalance itself. */
  def keyed(spark: SparkSession, dir: String, name: String, keys: String*): DataFrame =
    // The partition count is PINNED (REPARTITION_BY_NUM semantics): an
    // unpinned keyed repartition is AQE-coalescible, and AQE's byte-based
    // coalescing only sees the (small) pre-exchange bytes — it cannot see
    // post-exchange compute amplification (regex/explode/decode), so it
    // happily coalesced a 10M-row gram-generation stage onto one task
    // (measured: d27 2.2 s → 8.7 s). The whole point of this rebalance is
    // the compute spread; pin it.
    load(spark, dir, name, rebalance = Some(df =>
      df.repartition(df.sparkSession.sparkContext.defaultParallelism, keys.map(col): _*)))

  private def load(
      spark: SparkSession, dir: String, name: String,
      rebalance: Option[DataFrame => DataFrame]): DataFrame = {
    // events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark rejects
    // outright — PARQUET_TYPE_ILLEGAL — so we read it as epoch-nanos long and
    // convert) and, in newer corpus drops, as TIMESTAMP(MICROS) isAdjustedToUTC
    // =false (Spark TIMESTAMP_NTZ). Branch on what the footer actually says so
    // either vintage loads; both land on session-TZ TimestampType (UTC
    // everywhere here), keeping one downstream type and matching DuckDB's
    // naive-µs read of the same files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val df =
      if (name == "events") raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case org.apache.spark.sql.types.TimestampType => raw
        case other =>
          // Fail at load, not at first event-time use: a surprise encoding
          // (INT96, string, ...) would otherwise surface as a confusing
          // type error deep inside a window/join plan.
          sys.error(s"unexpected events.ts parquet type: $other " +
            "(expected nanos-as-long, TIMESTAMP_NTZ, or TimestampType)")
      }
      else raw

    // The test corpus ships one single-row-group file per table, so the
    // scan yields ONE input partition and everything upstream of the
    // first exchange runs on one core. Rebalance only when the scan's
    // parallelism is far below the session's — with a real multi-file
    // (100 TB) layout the condition is false and this is a no-op, which
    // is exactly right: there a blanket repartition would be a needless
    // full-table shuffle.
    rebalance match {
      case Some(f) if factTables(name) =>
        val scanParts: Int = scanPartsCache.computeIfAbsent(
          s"$dir/$name", _ => df.rdd.getNumPartitions)
        val target = spark.sparkContext.defaultParallelism
        if (scanParts * 4 < target) f(df) else df
      case _ => df
    }
  }

  /** Tables large enough that downstream compute wants full parallelism;
    * the dimension tables stay as-scanned (they broadcast anyway, and 32
    * near-empty tasks per tiny dim would be pure overhead). */
  private val factTables =
    Set("lineitem", "orders", "events", "documents", "embeddings")
}
