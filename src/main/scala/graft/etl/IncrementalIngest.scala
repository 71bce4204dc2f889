package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental Bronze → Silver on Structured Streaming's file source with
  * `Trigger.AvailableNow` — the reference's folder-read model made
  * literal: its ETL reads CSV *directories* so "new batch = new files in
  * the folder" (ref `glue_jobs/etl_job.py:42-44`), and each `_READY`
  * trigger reprocesses the whole folder. Here the checkpoint tracks seen
  * files, so each pass ingests ONLY the new ones and stops (AvailableNow
  * = drain everything available, then terminate — a batch job with
  * streaming's exactly-once file bookkeeping).
  *
  * The transform is the same Silver logic as [[CleanTransactions.run]]
  * (broadcast dim join → 4-rule filter → fecha_dia), minus the
  * `Observation` (batch-only API; incremental runs read per-batch row
  * counts off the streaming progress events instead).
  *
  * Scale: state is the checkpoint's file log (O(files), compacted by the
  * source), not data; per-pass work is O(new bytes). The day-partitioned
  * append sink plus exactly-once file-sink semantics make reruns and
  * crash-restarts safe — the same guarantees the reference gets from
  * Glue bookmarks + full-folder overwrite, at a fraction of the reread.
  */
object IncrementalIngest {

  /** The streaming Silver plan over a watched fact-CSV folder. */
  def silverStream(
      spark: SparkSession,
      factDir: String,
      dims: DataFrame,
      clock: Timestamp): DataFrame = {
    val facts = spark.readStream
      .option("header", "true")
      .schema(Schemas.factTransactions)
      .csv(factDir)
    val keep = CleanTransactions.rules(clock).map(_.passes).reduce(_ && _)
    facts.join(broadcast(dims), Seq("id_atm"), "left")
      .filter(keep)
      .withColumn("fecha_dia", to_date(col("fecha")))
  }

  /** One incremental pass: ingest every not-yet-seen file under
    * `factDir` into day-partitioned Silver parquet, then stop.
    * @return raw input rows read this pass (0 = nothing new) */
  def ingestOnce(
      spark: SparkSession,
      factDir: String,
      dimDir: String,
      outDir: String,
      checkpointDir: String,
      clock: Timestamp): Long = {
    val dims = CleanTransactions.readDims(spark, dimDir)
    val q = silverStream(spark, factDir, dims, clock).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .partitionBy("fecha_dia")
      .outputMode("append")
      .format("parquet")
      .start(outDir)
    q.awaitTermination()
    q.recentProgress.map(_.numInputRows).sum
  }
}
