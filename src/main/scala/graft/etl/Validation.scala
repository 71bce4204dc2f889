package graft.etl

import java.sql.Timestamp

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Post-ETL validation as typed, assertable results — the reference's QA
  * queries (ref `qa/validate_data.py:93-148`, `qa/validate_data_fast.py:
  * 119-171`) return printed tables eyeballed by a human; these return
  * case classes a test (or orchestrator) can gate on. All checks run as
  * ONE combined aggregation job (the "menos roundtrips" idea of
  * `validate_data_fast.py`, taken to its conclusion).
  */
final case class ValidationReport(
    totalRows: Long,
    nonNullAtm: Long,
    nonNullMonto: Long,
    nonNullUbicacion: Long,
    minMonto: java.math.BigDecimal,
    maxMonto: java.math.BigDecimal,
    montosInvalidos: Long,
    distinctAtms: Long,
    distinctDays: Long) {
  def fkComplete: Boolean = nonNullAtm == totalRows
  def allMontosValid: Boolean = montosInvalidos == 0
}

object Validation {
  /** Scalar quality aggregate over Silver (A3+A4+A5 in SURVEY.md §2.4). */
  def validate(silver: DataFrame): ValidationReport = {
    val row = silver.agg(
      count(lit(1)).as("total"),
      count(col("id_atm")).as("nn_atm"),
      count(col("monto")).as("nn_monto"),
      count(col("ubicacion")).as("nn_ubicacion"),
      min(col("monto")).as("min_monto"),
      max(col("monto")).as("max_monto"),
      count(when(col("monto") <= 0, 1)).as("montos_invalidos"),
      countDistinct(col("id_atm")).as("n_atms"),
      countDistinct(col("fecha_dia")).as("n_days")).collect()(0)
    ValidationReport(
      totalRows = row.getLong(0),
      nonNullAtm = row.getLong(1),
      nonNullMonto = row.getLong(2),
      nonNullUbicacion = row.getLong(3),
      minMonto = row.getDecimal(4),
      maxMonto = row.getDecimal(5),
      montosInvalidos = row.getLong(6),
      distinctAtms = row.getLong(7),
      distinctDays = row.getLong(8))
  }

  /** Standalone-QA source fallback, parity with the reference's
    * validation script (ref `qa/validate_data.py:40-78`): try the
    * processed Silver parquet first (the fast path), and if it is
    * missing or unreadable, re-derive the clean frame from the raw CSV
    * folders and validate that instead. Returns the report tagged with
    * the source that produced it (`"processed"` | `"raw"`), the
    * reference's `data_source` marker as a value instead of a print.
    *
    * Deviation by design: the reference's raw fallback re-applies only
    * three of the four quality rules (it omits the future-date filter,
    * ref `qa/validate_data.py:63-67`), so its fallback numbers can
    * drift from what the ETL actually wrote. Here the fallback runs the
    * SAME [[CleanTransactions]] rule set with the injected clock, so
    * the fallback report is identical to the processed-path report —
    * PipelineSpec deletes Silver and asserts exactly that. */
  def fromSilverOrRaw(
      spark: SparkSession,
      silverPath: String,
      rawRoot: String,
      clock: Timestamp): (ValidationReport, String) = {
    // guard only the read (schema resolution is eager, so a missing or
    // footer-corrupt table fails HERE); validation errors still propagate
    val processed =
      try Some(spark.read.parquet(silverPath))
      catch { case NonFatal(_) => None }
    processed match {
      case Some(silver) => (validate(silver), "processed")
      case None =>
        val facts = CleanTransactions.readFacts(spark, s"$rawRoot/fact_transactions")
        val dims = CleanTransactions.readDims(spark, s"$rawRoot/dim_atms")
        val (silver, _) = CleanTransactions.run(facts, dims, clock)
        (validate(silver), "raw")
    }
  }

  /** Top ATMs by money moved (A1/O1, ref `glue_jobs/etl_job.py:147-158`). */
  def topAtms(silver: DataFrame, k: Int = 5): DataFrame =
    silver
      .groupBy(col("id_atm"), col("ubicacion"))
      .agg(
        count(lit(1)).as("num_transacciones"),
        round(sum(col("monto")), 2).as("monto_total"),
        round(avg(col("monto")), 2).as("monto_promedio"))
      .orderBy(desc("monto_total"), col("id_atm"))
      .limit(k)

  /** Daily summary (A2, ref `glue_jobs/etl_job.py:163-174`). */
  def dailySummary(silver: DataFrame): DataFrame =
    silver
      .groupBy(col("fecha_dia"))
      .agg(
        count(lit(1)).as("num_transacciones"),
        round(sum(col("monto")), 2).as("monto_total"),
        round(min(col("monto")), 2).as("monto_minimo"),
        round(max(col("monto")), 2).as("monto_maximo"),
        round(avg(col("monto")), 2).as("monto_promedio"))
      .orderBy(desc("fecha_dia"))
}
