package graft.etl

import java.sql.Timestamp

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end medallion pipeline: Bronze CSV → Silver Parquet →
  * Gold Parquet, with the reference's event-driven trigger contract.
  *
  * Orchestration collapses the reference's four service hops (S3 event →
  * Step Function → Glue → Redshift, ref `infrastructure/main.tf:341-511`)
  * into one Spark application: the `_READY` flag written last by the
  * producer (race-avoidance, ref `data_gen/generator.py:177-191`) gates
  * the run and is deleted first for idempotence (ref `main.tf:350-361`);
  * a `_SUCCESS` marker plays the role of `job.commit()`.
  *
  * Scale notes: Silver is written partitioned by `fecha_dia` with DYNAMIC
  * partition overwrite — re-running a batch replaces only the days it
  * contains instead of truncating history (the reference's full
  * `mode("overwrite")` at `glue_jobs/etl_job.py:130` would). Gold tables
  * aggregate to one row per (ATM[, day]) — tiny relative to the fact —
  * so their full overwrite is safe at any scale.
  */
final case class PipelineResult(
    stats: RuleStats,
    validation: ValidationReport,
    silverPath: String,
    goldPaths: Map[String, String])

object Pipeline {

  // Trigger flags travel through the Hadoop FileSystem of their path's
  // scheme — the reference's _READY contract is S3-native (ref
  // `main.tf:350-361`), so a local-only flag check would be dishonest.
  // Resolving from a bare Configuration (not the session) keeps `ready`
  // callable before a SparkSession exists, as a poll loop does.
  private def flagPath(root: String, flag: String) = new Path(root, flag)

  def ready(inputRoot: String): Boolean = {
    val p = flagPath(inputRoot, "_READY")
    p.getFileSystem(new Configuration()).exists(p)
  }

  /** @param inputRoot  dir containing `dim_atms/` and `fact_transactions/`
    *                   CSV folders plus the `_READY` flag
    * @param outputRoot dir receiving the silver and gold Parquet tables
    * @param clock      "now" for the future-date rule (injected for
    *                   determinism; production passes wall-clock)
    */
  def run(
      spark: SparkSession,
      inputRoot: String,
      outputRoot: String,
      clock: Timestamp): PipelineResult = {
    require(ready(inputRoot), s"no _READY flag under $inputRoot")
    val readyFlag = flagPath(inputRoot, "_READY")
    readyFlag.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(readyFlag, false) // consume trigger first

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    val facts = CleanTransactions.readFacts(spark, s"$inputRoot/fact_transactions")
    val dims = CleanTransactions.readDims(spark, s"$inputRoot/dim_atms")
    val (silver, obs) = CleanTransactions.run(facts, dims, clock)

    val silverPath = s"$outputRoot/silver"
    silver.write
      .mode(SaveMode.Overwrite)
      .partitionBy("fecha_dia")
      .parquet(silverPath)

    // The write is the action that populates the observation; kept row
    // count comes from the written files (no second pass over raw).
    val silverBack = spark.read.parquet(silverPath)
    val kept = silverBack.count()
    val stats = Rules.stats(obs, CleanTransactions.rules(clock), kept)

    val gold = Map(
      "gold_dim_atms" -> Gold.dimAtmsActual(silverBack),
      "gold_daily_balance" -> Gold.dailyBalance(silverBack),
      "gold_atm_ranking" -> Gold.atmRanking(silverBack))
    val goldPaths = gold.map { case (name, df) =>
      val p = s"$outputRoot/$name"
      df.write.mode(SaveMode.Overwrite).parquet(p)
      name -> p
    }

    val report = Validation.validate(silverBack)
    val success = flagPath(outputRoot, "_SUCCESS")
    success.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(success, true).close()
    PipelineResult(stats, report, silverPath, goldPaths)
  }
}
