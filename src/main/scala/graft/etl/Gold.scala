package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Silver → Gold: the three warehouse tables the reference builds in
  * Redshift (ref `sql/ddl_gold.sql:22-62`), collapsed into Spark jobs
  * writing Parquet (the COPY/UNLOAD legs disappear — SURVEY.md §3.2).
  */
object Gold {

  /** SCD-Type-1 current-state dimension (ref `sql/ddl_gold.sql:23-32`,
    * `SELECT DISTINCT` over 7 columns). The reference's DISTINCT is
    * order-nondeterministic if an ATM's attributes ever differ across
    * batches; we define latest-wins explicitly: the attribute set seen on
    * the ATM's most recent transaction (row_number over fecha desc).
    * Documented deviation per SURVEY.md §7.4. */
  def dimAtmsActual(silver: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id_atm"))
      .orderBy(desc("fecha"), desc("id_transaccion"))
    silver
      .select(
        col("id_atm"), col("ubicacion"), col("latitud"), col("longitud"),
        col("capacidad_maxima"), col("modelo"), col("estado"),
        col("fecha"), col("id_transaccion"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "fecha", "id_transaccion")
  }

  /** Daily net cash flow per ATM: pivoted conditional sums + their
    * difference (ref `sql/ddl_gold.sql:37-47`). Exact decimal arithmetic
    * end-to-end — deposits − withdrawals must be exact, not IEEE. */
  def dailyBalance(silver: DataFrame): DataFrame = {
    def flow(kind: String) =
      sum(when(col("tipo_movimiento") === kind, col("monto"))
        .otherwise(lit(0).cast(DecimalType(18, 2))))
    silver
      .groupBy(col("id_atm"), col("fecha_dia"))
      .agg(
        flow("DEPOSITO").as("total_depositos"),
        flow("RETIRO").as("total_retiros"),
        count(lit(1)).as("n_transacciones"))
      .withColumn("flujo_neto_dia", col("total_depositos") - col("total_retiros"))
  }

  /** ATM ranking by money moved (ref `sql/ddl_gold.sql:52-62`):
    * count/sum/avg per ATM, globally ordered. The ORDER BY is part of the
    * table contract in the reference CTAS; at scale the sort is over one
    * row per ATM — cheap regardless of fact cardinality. */
  def atmRanking(silver: DataFrame): DataFrame =
    silver
      .groupBy(col("id_atm"), col("ubicacion"), col("modelo"))
      .agg(
        count(lit(1)).as("num_transacciones"),
        sum(col("monto")).as("dinero_total_movido"),
        avg(col("monto")).as("monto_promedio"))
      .orderBy(desc("dinero_total_movido"), col("id_atm"))
}
