package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the payload of the right row with
  * the greatest `rightTs <= leftTs` within the same key (inclusive).
  *
  * Spark has no native as-of join, and the naive range-join formulation
  * (`l.key = r.key AND r.ts <= l.ts` + max-per-group) explodes into a
  * per-key cartesian before aggregating. This composition instead unions
  * the two sides tagged, then takes a running `last(ignoreNulls)` over a
  * window partitioned by key and ordered by (ts, tag) — right rows sort
  * before left rows at equal timestamps, giving inclusive semantics.
  *
  * Scale: exactly ONE shuffle (hash partition by key), then a linear
  * per-partition sweep — no row multiplication, no driver collection.
  * Skewed keys degrade to single-task sort per key, same as any
  * windowed operator; salt upstream if a single key exceeds a partition.
  *
  * Requirements: right must be unique per (key, ts) — pre-dedupe with a
  * row_number window if not (see q26_asof_join) — and left/right column
  * names must be disjoint apart from the join columns.
  *
  * Payload columns travel as ONE struct through a single
  * `last(ignoreNulls)`: filling each column independently would let a
  * right row carrying a NULL in one payload column mix values from
  * different right rows (that column filled from an older row, the rest
  * from the newer one). The struct wrapper is never null for right rows,
  * so every payload value in the output comes from the same matched row —
  * including its genuine NULLs.
  */
object AsOfJoin {
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(p => right.schema(p)))
    val lSel = left.select(
      Seq(
        col(leftKey).as("__key"),
        col(leftTs).as("__ts"),
        lit(1).as("__tag")) ++
        leftCols.map(col) :+
        lit(null).cast(payloadType).as("__payload"): _*)
    val rSel = right.select(
      Seq(
        col(rightKey).as("__key"),
        col(rightTs).as("__ts"),
        lit(0).as("__tag")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(col): _*).as("__payload"): _*)

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSel.unionByName(rSel)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(p => col("__payload").getField(p).as(p)): _*)
  }
}
