package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for ANN search: split each `dim`-dim vector
  * into `m` subvectors, train an independent `k`-centroid codebook per
  * subspace (deterministic Lloyd via [[IvfIndex.centroids]]), and encode
  * every vector as `m` small codes — 64 doubles become 4 bytes at
  * m=4, k=16. Queries run ASYMMETRIC distance (ADC): the query stays
  * exact, each subspace contributes a precomputed `d²(q_sub, centroid)`
  * table lookup, and a vector's approximate distance is the sum of its
  * codes' lookups (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011).
  *
  * Scale shape: codebooks are m·k·(dim/m) doubles — tiny, collected and
  * broadcast exactly like IVF centroids. Encoding is m argmin-assign
  * passes (each one partial-agged shuffle keyed on vec_id); the ADC
  * lookup tables are m·k rows broadcast to a map-only scan of the code
  * table. The corpus is never collected; at 100 TB the 4-byte codes are
  * what sits in memory while the raw vectors stay on disk — PQ is the
  * memory-side compression leg of the IVF+PQ layout every production
  * ANN system ships.
  *
  * Determinism: inherits [[IvfIndex]]'s contract (seeds `vec_id < k`,
  * fixed dist2 tree, cid tie-break) per subspace, so codes and ADC
  * rankings are bit-stable across partitionings — PqSpec proves it. */
object PqIndex {

  /** The m per-subspace views of the corpus: (sub, (vec_id, v_sub)). */
  def subVectors(vecs: DataFrame, dim: Int, m: Int): Seq[(Int, DataFrame)] = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val sd = dim / m
    (0 until m).map(i =>
      i -> vecs.select(col("vec_id"), slice(col("v"), i * sd + 1, sd).as("v")))
  }

  /** Train the m codebooks: (sub, (cid, cv)). */
  def codebooks(
      vecs: DataFrame, dim: Int, m: Int, k: Int, iters: Int): Seq[(Int, DataFrame)] =
    subVectors(vecs, dim, m).map { case (i, sv) =>
      i -> IvfIndex.centroids(sv, k, iters)
    }

  /** Encode the corpus: one row per vec_id with columns c0..c(m-1). */
  def encode(
      vecs: DataFrame, dim: Int, cbs: Seq[(Int, DataFrame)]): DataFrame = {
    val m = cbs.size
    subVectors(vecs, dim, m).zip(cbs).map { case ((i, sv), (_, cb)) =>
      IvfIndex.assign(sv, cb).select(col("vec_id"), col("cid").as(s"c$i"))
    }.reduce(_.join(_, "vec_id"))
  }

  /** All ADC distances for the query vector `queryId`: per subspace,
    * the k-row `d²(q_sub, centroid)` lookup table broadcasts onto the
    * code table; a vector's approximate distance is the sum of its
    * codes' lookups. Map-only over the code table. */
  def adc(
      vecs: DataFrame,
      dim: Int,
      cbs: Seq[(Int, DataFrame)],
      codes: DataFrame,
      queryId: Long): DataFrame = {
    val m = cbs.size
    val luts = subVectors(vecs, dim, m).zip(cbs).map { case ((i, sv), (_, cb)) =>
      val qsub = sv.filter(col("vec_id") === queryId).select(col("v").as("qv"))
      cb.crossJoin(broadcast(qsub))
        .select(col("cid").as(s"c$i"), IvfIndex.dist2(col("qv"), col("cv")).as(s"d$i"))
    }
    val joined = luts.zipWithIndex.foldLeft(codes) { case (acc, (lut, i)) =>
      acc.join(broadcast(lut), Seq(s"c$i"))
    }
    joined.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        (0 until m).map(i => col(s"d$i")).reduce(_ + _).as("adc"))
  }

  /** ADC shortlist: the `topK` smallest approximate distances. The
    * production retrieval shape is shortlist-then-rerank: ADC picks a
    * candidate set cheaply (codes only), exact distance re-ranks it. */
  def adcTopK(
      vecs: DataFrame,
      dim: Int,
      cbs: Seq[(Int, DataFrame)],
      codes: DataFrame,
      queryId: Long,
      topK: Int): DataFrame =
    adc(vecs, dim, cbs, codes, queryId)
      .orderBy(col("adc"), col("vec_id"))
      .limit(topK)

  /** Per-subspace ADC lookup tables for a query SET (qid, qv): each is
    * (qid, c_i, d_i) — Q·k rows per subspace, broadcastable for any
    * realistic query batch. The batched form of the scalar LUTs in
    * [[adc]]. */
  def adcLutsBatch(
      queries: DataFrame, dim: Int, cbs: Seq[(Int, DataFrame)]): Seq[(Int, DataFrame)] = {
    val m = cbs.size
    val sd = dim / m
    cbs.map { case (i, cb) =>
      val qsub = queries.select(
        col("qid"), slice(col("qv"), i * sd + 1, sd).as("qsub"))
      i -> cb.crossJoin(broadcast(qsub))
        .select(col("qid"), col("cid").as(s"c$i"),
          IvfIndex.dist2(col("qsub"), col("cv")).as(s"d$i"))
    }
  }

  /** Batched ADC: `cands` carries (qid, vec_id, c0..c(m-1)) — each
    * query's candidate codes (typically IVF-probed members joined to
    * the code table) — and the result is (qid, vec_id, adc). Map-only:
    * m broadcast lookup joins on (qid, code), one pass over the
    * candidates; Q queries ride one plan instead of Q driver-looped
    * jobs. */
  def adcBatch(
      queries: DataFrame,
      dim: Int,
      cbs: Seq[(Int, DataFrame)],
      cands: DataFrame): DataFrame = {
    val m = cbs.size
    val joined = adcLutsBatch(queries, dim, cbs).foldLeft(cands) {
      case (acc, (i, lut)) => acc.join(broadcast(lut), Seq("qid", s"c$i"))
    }
    joined.select(col("qid"), col("vec_id"),
      (0 until m).map(i => col(s"d$i")).reduce(_ + _).as("adc"))
  }

  /** Reconstruction x̂ per vector: its codes' centroids concatenated.
    * The PQ core identity — `ADC(q, codes(x)) = d²(q, x̂)` — holds by
    * construction up to float summation order; s11/PqSpec grade it
    * numerically to ~1e-9 relative error. */
  def decode(codes: DataFrame, cbs: Seq[(Int, DataFrame)]): DataFrame = {
    val joined = cbs.foldLeft(codes) { case (acc, (i, cb)) =>
      acc.join(
        broadcast(cb.select(col("cid").as(s"c$i"), col("cv").as(s"v$i"))),
        Seq(s"c$i"))
    }
    joined.select(col("vec_id"),
      concat(cbs.map { case (i, _) => col(s"v$i") }: _*).as("vhat"))
  }
}
