package graft.etl

import org.apache.spark.sql.types._

/** Explicit schema contracts for the LogiCash star schema.
  *
  * The reference relies on CSV `inferSchema` (ref `glue_jobs/etl_job.py:51,58`)
  * and its QA-fast variant hand-builds StructTypes that *drift* from the
  * generator (ref `qa/validate_data_fast.py:63-77` — see SURVEY.md §1).
  * Here the explicit schema IS the contract: inference is an opt-in dev
  * mode, and every reader goes through these types. Money is
  * DECIMAL(18,2) from ingestion onward (ref casts late at
  * `glue_jobs/etl_job.py:109`; DDL mirror at `sql/ddl_staging.sql:24-37`).
  */
object Schemas {
  /** Dimension: one row per ATM (ref `data_gen/generator.py:94-102`). */
  val dimAtms: StructType = StructType(Seq(
    StructField("id_atm", StringType, nullable = false),
    StructField("ubicacion", StringType, nullable = true),
    StructField("latitud", DoubleType, nullable = true),
    StructField("longitud", DoubleType, nullable = true),
    StructField("capacidad_maxima", LongType, nullable = true),
    StructField("modelo", StringType, nullable = true),
    StructField("estado", StringType, nullable = true)))

  /** Fact: one row per transaction (ref `data_gen/generator.py:166-173`).
    * `id_atm` is a nullable FK (1% injected nulls in the fixture). */
  val factTransactions: StructType = StructType(Seq(
    StructField("id_transaccion", StringType, nullable = false),
    StructField("id_atm", StringType, nullable = true),
    StructField("fecha", TimestampType, nullable = true),
    StructField("monto", DecimalType(18, 2), nullable = true),
    StructField("tipo_movimiento", StringType, nullable = true),
    StructField("status_transaccion", StringType, nullable = true)))
}
