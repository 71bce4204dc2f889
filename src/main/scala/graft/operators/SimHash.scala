package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SimHash: 64-bit locality-sensitive signature for near-dup detection.
  *
  * Each token contributes +1/−1 to 64 bit-counters via its xxhash64 bits;
  * the signature sets bit i when counter i is positive. Computed as one
  * hash-agg pass with 64 conditional-sum columns (all codegen'd, map-side
  * combinable) — no UDFs, no driver collection. Near-dups then reduce to
  * Hamming-distance probing on a 64-bit integer (bit-rotation bucketing
  * at scale).
  */
object SimHash {
  /** @param tokenized (doc_id, w: array<string>) */
  def signatures(tokenized: DataFrame): DataFrame = {
    val tok = tokenized
      .select(col("doc_id"), explode(col("w")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), sig.as("simhash"))
  }
}
