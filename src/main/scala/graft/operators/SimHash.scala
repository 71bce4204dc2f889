package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SimHash: 60-bit locality-sensitive signature for near-dup detection.
  *
  * Each token contributes +1/−1 to 60 bit-counters via its hash bits;
  * the signature sets bit i when counter i is positive. Computed as one
  * hash-agg pass with 60 conditional-sum columns (all codegen'd, map-side
  * combinable) — no UDFs, no driver collection. Near-dups then reduce to
  * Hamming-distance probing on a 64-bit integer (banded bucketing in
  * d16).
  *
  * The token hash is PORTABLE on purpose (like MinHash's, r3): two
  * domain-separated rolling hashes ([[graft.functions.RollingHash]],
  * each < 2^30) concatenated into 60 bits — reproducible from plain SQL,
  * so the whole signature (and d16's candidate pairs on top of it) is
  * DuckDB-oracle-checkable, where xxhash64 was engine-private.
  */
object SimHash {
  val Bits = 60

  /** 60-bit portable token hash: rh(t) in the high 30 bits, rh("g2:"+t)
    * in the low 30 (domain separation makes the halves independent). */
  private def hash60(t: Column): Column =
    shiftleft(graft.functions.GraftFunctions.rollingHash(t), 30)
      .bitwiseOR(graft.functions.GraftFunctions.rollingHash(concat(lit("g2:"), t)))

  /** @param tokenized (doc_id, w: array<string>) */
  def signatures(tokenized: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(tokenized.sparkSession) // idempotent
    val tok = tokenized
      .select(col("doc_id"), explode(col("w")).as("t"))
      .select(col("doc_id"), hash60(col("t")).as("h"))
    val bitSums = (0 until Bits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until Bits)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), sig.as("simhash"))
  }
}
