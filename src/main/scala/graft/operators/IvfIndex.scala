package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions

/** IVF (inverted-file) coarse quantizer for ANN search: a deterministic
  * Lloyd's k-means over the embedding corpus, built entirely from
  * DataFrame ops.
  *
  * Design for scale (the point of IVF at 100 TB):
  *   - centroids are O(k·dim) — vanishingly small next to the corpus —
  *     so each refined centroid set is collected once and re-broadcast;
  *     the corpus itself is only ever scanned, never collected (same
  *     collect-tiny/broadcast pattern MLlib's KMeans uses). Collecting
  *     also keeps the plan flat: k iterations chain k scans, not a
  *     k-deep recursive lineage.
  *   - assignment is corpus ⨯ broadcast(centroids) with a map-side
  *     `min(struct(d2, cid))` argmin — one partial-aggregated shuffle by
  *     vec_id, no window sort over the corpus.
  *   - centroid update is posexplode → exact-decimal per-(cell, dim)
  *     mean — order-independent, so results are identical on any
  *     partitioning (and to the DuckDB oracle).
  *
  * Determinism contract (shared with the oracle SQL): seeds are
  * `vec_id < k`; squared distance is `dot(v,v) + dot(c,c) − 2·dot(v,c)`
  * with the strict-fold dot product on both engines (bit-identical);
  * argmin ties break on cell id; means are exact decimal sums / count.
  */
object IvfIndex {

  private def dot(a: Column, b: Column): Column = GraftFunctions.dot(a, b)

  /** Squared L2 distance with a fixed expression shape — the same tree
    * `(dot(v,v) + dot(c,c)) − 2·dot(v,c)` is evaluated by DuckDB, so the
    * doubles round identically. */
  def dist2(v: Column, c: Column): Column =
    dot(v, v) + dot(c, c) - lit(2) * dot(v, c)

  /** Nearest-centroid assignment: (vec_id, cid). Broadcast the (tiny)
    * centroid set; argmin via `min(struct(d2, cid))` — partial-aggregable,
    * deterministic (cid tie-break). */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("cid"), dist2(col("v"), col("cv")).as("d2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))

  /** IVF ANN probe — the accuracy/cost dial of the index: cosine top-`k`
    * for query vector `queryId` among the vectors assigned to the
    * `nprobe` centroid cells nearest the query. nprobe=1 reads one
    * cell's worth of corpus; nprobe = #cells degenerates to exact
    * search. Recall@k is monotone non-decreasing in nprobe BY
    * CONSTRUCTION (more probes only widen the candidate set) and
    * reaches 1.0 at full probe width — IvfRecallSpec measures the
    * curve on the real corpus. At 100 TB the assignment is a
    * cell-partitioned table and a probe reads nprobe partitions; the
    * unprobed corpus is never touched. */
  /** The `nprobe` centroid cells nearest the query vector (d2 order,
    * cid tie-break) — the probe's cell-selection step, exposed so a
    * PERSISTED index probe (s23: the assignment as a cid-partitioned
    * graft table, probe = partition-pruned scan) selects exactly the
    * cells the inline probe would. */
  def nearestCells(cent: DataFrame, qv: DataFrame, nprobe: Int): DataFrame =
    cent.crossJoin(broadcast(qv))
      .select(col("cid"), dist2(col("qv"), col("cv")).as("d2"))
      .orderBy(col("d2"), col("cid"))
      .limit(nprobe)
      .select(col("cid"))

  def probe(
      vecs: DataFrame,
      cent: DataFrame,
      queryId: Long,
      nprobe: Int,
      k: Int): DataFrame = {
    val qv = vecs.filter(col("vec_id") === queryId).select(col("v").as("qv"))
    val nearCells = nearestCells(cent, qv, nprobe)
    assign(vecs, cent)
      .join(broadcast(nearCells), Seq("cid"))
      .filter(col("vec_id") =!= queryId)
      .join(vecs, Seq("vec_id"))
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), GraftFunctions.cosine(col("v"), col("qv")).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(k)
  }

  /** Batched cell probe — the query-SET form of [[probe]]: every
    * query's `nprobe` nearest cells in ONE plan, returned as
    * (qid, cid). `queries` is (qid, qv) — Q rows of dim doubles,
    * broadcastable for any realistic online batch; the window ranks
    * the Q·k (query × centroid) pairs, never the corpus. Q queries
    * cost one job, not Q driver-looped jobs — join the result to the
    * cell assignment to get each query's candidate members. */
  def probeBatch(queries: DataFrame, cent: DataFrame, nprobe: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2"), col("cid"))
    cent.crossJoin(broadcast(queries))
      .select(col("qid"), col("cid"), dist2(col("qv"), col("cv")).as("d2"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nprobe)
      .select(col("qid"), col("cid"))
  }

  /** `iters` Lloyd refinements from the deterministic seed set
    * (vec_id < k). Returns the final centroids (cid, cv). */
  def centroids(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    val seed = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").cast(IntegerType).as("cid"), col("v").as("cv"))
    refine(vecs, seed, iters)
  }

  /** `iters` distributed Lloyd refinements from an arbitrary centroid
    * frame (cid, cv). Centroid update is the exact-decimal
    * per-(cell, dim) mean — order-independent, bit-stable. */
  def refine(vecs: DataFrame, cent0: DataFrame, iters: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    var cent = cent0
    (1 to iters).foreach { _ =>
      val updated = assign(vecs, cent)
        .join(vecs, "vec_id")
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg((sum(col("x").cast(DecimalType(38, 8))).cast(DoubleType) / count(lit(1)))
          .as("mu"))
        .groupBy(col("cid"))
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("mu")))),
          _.getField("mu")).as("cv"))
      // k·dim doubles — collect the tiny centroid set and rebuild a local
      // relation so iteration i+1 broadcasts data, not a deeper plan
      val rows = updated.select(col("cid"), col("cv"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .sortBy(_._1)
      cent = rows.toSeq.toDF("cid", "cv")
    }
    cent
  }

  /** k-means||-style seeding (Bahmani et al.), DETERMINIZED for this
    * engine's cross-engine reproducibility contract: where k-means||
    * samples each point with probability ∝ its cost, this takes the
    * `k·oversample` points FARTHEST from the current seed set each
    * round (top-cost, ties on vec_id) — same effect (seeds spread to
    * the mass the current set explains worst), no RNG. Then, exactly
    * like k-means||, the oversampled candidate set — O(rounds·k·
    * oversample) rows, tiny — is weighted by its assigned corpus mass
    * and reduced to k seeds by a DRIVER-LOCAL weighted Lloyd, and the
    * k seeds refine distributed for `iters` rounds.
    *
    * Scale shape: `rounds` corpus scans for seeding (each the same
    * broadcast-argmin as [[assign]]), one for weighting, `iters` for
    * refinement — the corpus is never collected; the driver only ever
    * holds O(candidates·dim) doubles. Contrast first-k seeding
    * ([[centroids]]): one fewer scan, but seeds are whatever the first
    * k rows happen to be — IvfSeedQualitySpec measures the recall
    * difference on the real corpus. */
  def centroidsScalable(
      vecs: DataFrame,
      k: Int,
      iters: Int,
      rounds: Int = 3,
      oversample: Int = 2): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val l = math.max(1, k * oversample)
    // round 0: the single deterministic seed (lowest vec_id)
    var cand: Seq[(Long, Seq[Double])] =
      vecs.orderBy(col("vec_id")).limit(1)
        .select(col("vec_id"), col("v"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    (1 to rounds).foreach { _ =>
      val candDf = cand.toDF("cid", "cv")
      val have = cand.map(_._1).toSet
      val far = vecs.filter(!col("vec_id").isin(have.toSeq: _*))
        .crossJoin(broadcast(candDf))
        .select(col("vec_id"), col("v"), dist2(col("v"), col("cv")).as("d2"))
        .groupBy(col("vec_id"))
        .agg(min(col("d2")).as("cost"), first(col("v")).as("v"))
        .orderBy(desc("cost"), col("vec_id"))
        .limit(l)
        .select(col("vec_id"), col("v"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      cand = (cand ++ far).sortBy(_._1)
    }
    // weight candidates by assigned corpus mass (one scan)
    val candDf = cand.zipWithIndex
      .map { case ((vid, v), i) => (i, vid, v) }.toDF("cid", "vid", "cv")
    val wByCid = assign(vecs, candDf.select(col("cid"), col("cv")))
      .groupBy(col("cid")).agg(count(lit(1)).as("w"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val weighted: Array[(Long, Array[Double], Double)] = cand.zipWithIndex.map {
      case ((vid, v), i) => (vid, v.toArray, wByCid.getOrElse(i, 0L).toDouble)
    }.toArray
    // driver-local weighted Lloyd on the tiny candidate set: seeds are
    // the k heaviest candidates (ties on vec_id), 10 rounds
    val dim = weighted.head._2.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var seeds = weighted.sortBy { case (vid, _, w) => (-w, vid) }
      .take(k).map(_._2.clone())
    (1 to 10).foreach { _ =>
      val sums = Array.fill(seeds.length)(new Array[Double](dim))
      val mass = new Array[Double](seeds.length)
      weighted.foreach { case (_, v, w) =>
        var best = 0; var bestD = Double.MaxValue; var j = 0
        while (j < seeds.length) {
          val d = d2(v, seeds(j)); if (d < bestD) { bestD = d; best = j }; j += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i) * w; i += 1 }
        mass(best) += w
      }
      seeds = seeds.indices.map { j =>
        if (mass(j) == 0.0) seeds(j)
        else sums(j).map(_ / mass(j))
      }.toArray
    }
    val seedDf = seeds.toSeq.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toDF("cid", "cv")
    refine(vecs, seedDf, iters)
  }
}
