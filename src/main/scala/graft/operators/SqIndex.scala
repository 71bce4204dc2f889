package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization (SQ8) for ANN search — the middle
  * compression tier between raw vectors and PQ codes: each dimension is
  * affinely mapped to an 8-bit code against corpus-trained per-dimension
  * bounds, so 64 doubles (512 B) become 64 codes (64 B at storage; kept
  * as array<int> here) with a HARD per-dimension reconstruction
  * guarantee |x_j − x̂_j| ≤ scale_j/2 — unlike PQ, the error bound is
  * data-independent once the bounds are trained. Every production
  * vector store ships this tier (FAISS `SQ8`, Milvus/pgvector scalar
  * quantization) as the default when PQ's recall loss is unacceptable.
  *
  * Scale shape: training is ONE aggregate of 2·dim partial-aggregable
  * min/max expressions — no explode, no shuffle of vector contents;
  * 2·dim doubles collect to the driver and broadcast back as literals
  * (the IVF-centroid / PQ-codebook contract). Encode is map-only.
  * Query-time distance is computed FROM THE CODES in one fused
  * codegen'd array fold — the raw vectors stay on disk; only the
  * re-rank shortlist reads them (the IVF+SQ serving layout).
  *
  * Determinism: bounds are exact min/max (order-free), the encode and
  * distance folds are fixed expression trees in array order — codes and
  * rankings are bit-stable across partitionings (SqSpec proves it). */
object SqIndex {

  /** Train per-dimension (min, scale): one aggregate, 2·dim columns. */
  def params(vecs: DataFrame, dim: Int): (Seq[Double], Seq[Double]) = {
    val aggs = (1 to dim).flatMap(j => Seq(
      min(element_at(col("v"), j)).as(s"mn$j"),
      max(element_at(col("v"), j)).as(s"mx$j")))
    val row = vecs.agg(aggs.head, aggs.tail: _*).head
    val mins = (0 until dim).map(j => row.getDouble(2 * j))
    val scales = (0 until dim).map(j =>
      (row.getDouble(2 * j + 1) - row.getDouble(2 * j)) / 255.0)
    (mins, scales)
  }

  /** Map-only encode: code_j = round((x_j − min_j)/scale_j), clamped to
    * [0, 255]; a constant dimension (scale 0) encodes as 0 and
    * reconstructs exactly (x̂_j = min_j). */
  def encode(vecs: DataFrame, mins: Seq[Double], scales: Seq[Double]): DataFrame = {
    val mn = typedlit(mins)
    val sc = typedlit(scales)
    vecs.select(col("vec_id"),
      transform(col("v"), (x, i) =>
        when(element_at(sc, i + 1) === 0d, lit(0))
          .otherwise(least(greatest(
            round((x - element_at(mn, i + 1)) / element_at(sc, i + 1))
              .cast("int"), lit(0)), lit(255)))).as("codes"))
  }

  /** Explicit reconstruction x̂_j = min_j + code_j·scale_j. */
  def decode(codes: DataFrame, mins: Seq[Double], scales: Seq[Double]): DataFrame = {
    val mn = typedlit(mins)
    val sc = typedlit(scales)
    codes.select(col("vec_id"),
      transform(col("codes"), (c, i) =>
        element_at(mn, i + 1) + c.cast("double") * element_at(sc, i + 1))
        .as("vhat"))
  }

  /** Squared L2 distance to the query computed directly FROM the codes —
    * one fused fold, no materialized reconstruction. Must equal
    * `IvfIndex.dist2(x̂, q)` on the explicit reconstruction (the SQ
    * identity the registry grades). */
  def dist2Codes(
      codes: Column, qv: Column,
      mins: Seq[Double], scales: Seq[Double]): Column = {
    val mn = typedlit(mins)
    val sc = typedlit(scales)
    aggregate(
      transform(codes, (c, i) => {
        val e = element_at(qv, i + 1) -
          (element_at(mn, i + 1) + c.cast("double") * element_at(sc, i + 1))
        e * e
      }),
      lit(0.0), (acc, x) => acc + x)
  }
}
