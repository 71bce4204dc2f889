package graft.queries

import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec}
import graft.functions.GraftFunctions
import graft.operators.IvfIndex

/** s17's exactness contract: IVF ball-bound cell pruning must return
  * EXACTLY the brute-force radius-search result (no false negatives
  * from pruning, no false positives from the verify), and the bound
  * must actually prune (a vacuous bound that keeps every cell would
  * "pass" equivalence while testing nothing). */
class RadiusSearchSpec extends SparkSpec {

  private val tau = 0.3

  private def emb = {
    GraftFunctions.register(spark)
    graft.core.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
  }

  test("pruned radius search equals brute force on the real corpus") {
    val got = Registry.byName("s17_radius_search")
      .build(spark, sfDir)
      .select(col("qid"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val e = emb
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val brute = e.filter(col("vec_id") >= 4)
      .crossJoin(broadcast(q))
      .filter(GraftFunctions.cosine(col("v"), col("qv")) >= tau)
      .select(col("qid"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == brute, "pruned result must equal brute force")
    assert(got.nonEmpty, "fixture must produce hits at tau=0.3")
  }

  /** At the registry's tau = 0.3 this tiny fixture's near-random
    * vectors give every cell a ball bound above tau (nothing prunes —
    * equality alone would then be vacuous as a PRUNING test). So:
    * compute the (query, cell) bounds, pick a tau strictly above the
    * smallest bound, and prove BOTH that the bound prunes at that tau
    * AND that the pruned pipeline still equals brute force there —
    * exactness under actual pruning, not just under a vacuous bound. */
  test("bound prunes at a data-derived tau and stays exact under pruning") {
    val e = emb
    val corpus = e.filter(col("vec_id") >= 4)
      .withColumn("nrm", sqrt(GraftFunctions.dot(col("v"), col("v"))))
      .select(col("vec_id"), col("v"),
        transform(col("v"), x => x / col("nrm")).as("u"))
    val unit = corpus.select(col("vec_id"), col("u").as("v"))
    val cent = IvfIndex.centroids(unit, k = 16, iters = 2)
    val asg = IvfIndex.assign(unit, cent)
    val radii = asg
      .join(corpus.select(col("vec_id"), col("u")), Seq("vec_id"))
      .join(broadcast(cent), Seq("cid"))
      .groupBy(col("cid"))
      .agg(max(sqrt(IvfIndex.dist2(col("u"), col("cv")))).as("r"))
    val queries = e.filter(col("vec_id") < 4)
      .withColumn("qn", sqrt(GraftFunctions.dot(col("v"), col("v"))))
      .select(col("vec_id").as("qid"),
        transform(col("v"), x => x / col("qn")).as("qu"))
    val bounds = queries
      .crossJoin(broadcast(cent.join(radii, Seq("cid"))))
      .select((GraftFunctions.dot(col("qu"), col("cv")) + col("r"))
        .as("bound"))
      .collect().map(_.getDouble(0))
    val lo = bounds.min
    val hi = bounds.max
    assert(lo < hi, "fixture degenerate: all ball bounds identical")
    // strictly above the weakest cell's bound → that cell MUST prune;
    // midpoint keeps the test away from float-equality edges
    val tauP = lo + (hi - lo) / 2

    val got = SimilarityOps.radiusSearch(spark, sfDir, tauP)
      .select(col("qid"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val brute = e.filter(col("vec_id") >= 4)
      .crossJoin(broadcast(q))
      .filter(GraftFunctions.cosine(col("v"), col("qv")) >= tauP)
      .select(col("qid"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"pruned result at tau=$tauP must equal brute force")

    val surviving = bounds.count(_ >= tauP - 1e-6)
    assert(surviving < bounds.length,
      s"bound must prune: $surviving of ${bounds.length} (query, cell) pairs survived at tau=$tauP")
  }
}
