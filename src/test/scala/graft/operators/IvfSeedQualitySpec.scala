package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.GraftFunctions

/** Coarse-quantizer QUALITY, measured (round-12 verdict item 6): the
  * deterministic k-means||-style seeder ([[IvfIndex.centroidsScalable]])
  * vs the first-k seeder ([[IvfIndex.centroids]]) on the real
  * embeddings corpus — same Lloyd refinement, same probe path, graded
  * on (a) quantization cost (sum of squared distance to the assigned
  * centroid — the k-means objective itself) and (b) recall@10 at the
  * operating point the registry runs (nprobe=3). */
class IvfSeedQualitySpec extends SparkSpec {

  graft.functions.GraftFunctions.register(spark)

  private lazy val vecs = Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    .persist()

  private def cost(cent: DataFrame): Double =
    vecs.crossJoin(broadcast(cent))
      .select(col("vec_id"), IvfIndex.dist2(col("v"), col("cv")).as("d2"))
      .groupBy(col("vec_id")).agg(min(col("d2")).as("d2"))
      .agg(sum(col("d2"))).head.getDouble(0)

  private def recallAt(cent: DataFrame, nprobe: Int): Double = {
    val queries = Seq(0L, 3L, 7L, 11L, 17L, 23L, 29L, 31L, 41L, 47L, 53L, 61L)
    queries.map { qid =>
      val qv = vecs.filter(col("vec_id") === qid).select(col("v").as("qv"))
      val truth = vecs.filter(col("vec_id") =!= qid)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"), GraftFunctions.cosine(col("v"), col("qv")).as("sim"))
        .orderBy(desc("sim"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
      val got = IvfIndex.probe(vecs, cent, qid, nprobe = nprobe, k = 10)
        .collect().map(_.getLong(0)).toSet
      (got intersect truth).size.toDouble / truth.size
    }.sum / queries.size
  }

  test("k-means|| seeding: lower quantization cost than first-k, recall not worse at nprobe=3") {
    val k = 16
    val firstK = IvfIndex.centroids(vecs, k = k, iters = 2)
    val scalable = IvfIndex.centroidsScalable(vecs, k = k, iters = 2)
    val (cF, cS) = (cost(firstK), cost(scalable))
    val (rF, rS) = (recallAt(firstK, 3), recallAt(scalable, 3))
    info(f"quantization cost: first-k=$cF%.2f  kmeans||=$cS%.2f  (${100 * (cF - cS) / cF}%.1f%% better)")
    info(f"recall@10 nprobe=3: first-k=$rF%.2f  kmeans||=$rS%.2f")
    // the k-means objective must improve: farthest-point oversampling +
    // weighted reduction starts Lloyd in a better basin than "whatever
    // the first k rows happen to be"
    assert(cS <= cF,
      f"k-means|| seeding must not worsen quantization cost ($cS%.2f > $cF%.2f)")
    // RECORDED FINDING (the round-12 measurement): on this corpus the
    // cost improvement is real but small (~0.5% at k=16, iters=2) and
    // recall@10 at nprobe=3 is statistically FLAT (0.63 vs 0.62 over
    // 12 queries) — at 60-dim/sf0.001 the first-k seeds are already
    // near the data's spread, so better seeding buys little after two
    // Lloyd rounds. The seeder's value is insurance against adversarial
    // row order (first-k seeding degrades when the first k rows are
    // clustered; farthest-point cannot), at the price of `rounds` extra
    // corpus scans. The recall assertion is therefore non-inferiority
    // with a noise band, not strict improvement.
    assert(rS >= rF - 0.05,
      f"recall@10 at nprobe=3 regressed beyond noise: $rS%.2f vs $rF%.2f")
  }

  test("the seeder is deterministic: two builds produce identical centroids") {
    val a = IvfIndex.centroidsScalable(vecs, k = 8, iters = 1)
      .orderBy(col("cid")).collect().map(_.getSeq[Double](1)).toSeq
    val b = IvfIndex.centroidsScalable(vecs, k = 8, iters = 1)
      .orderBy(col("cid")).collect().map(_.getSeq[Double](1)).toSeq
    assert(a == b, "no RNG anywhere: bit-identical across builds")
  }
}
