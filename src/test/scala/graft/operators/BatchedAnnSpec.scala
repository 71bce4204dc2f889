package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The batched ANN query path ([[IvfIndex.probeBatch]],
  * [[PqIndex.adcBatch]]) must be EQUIVALENT to the scalar per-query
  * path it replaces — same probed cells, bit-identical ADC distances —
  * so s13's one-plan form inherits every recall property s8/s11/s12
  * already measured for the scalar form. */
class BatchedAnnSpec extends SparkSpec {

  graft.functions.GraftFunctions.register(spark)

  private lazy val vecs = Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    .persist()
  private val seeds = Seq(0L, 7L, 23L)
  private lazy val queries = vecs.filter(col("vec_id").isin(seeds: _*))
    .select(col("vec_id").as("qid"), col("v").as("qv"))

  test("probeBatch picks exactly the scalar probe's cells per query") {
    val cent = IvfIndex.centroids(vecs, k = 16, iters = 2).persist()
    val batched = IvfIndex.probeBatch(queries, cent, nprobe = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    seeds.foreach { qid =>
      // the scalar path's cell choice, recomputed exactly as probe does
      val qv = vecs.filter(col("vec_id") === qid).select(col("v").as("qv"))
      val scalar = cent.crossJoin(broadcast(qv))
        .select(col("cid"), IvfIndex.dist2(col("qv"), col("cv")).as("d2"))
        .orderBy(col("d2"), col("cid")).limit(4)
        .collect().map(_.getInt(0)).toSet
      assert(batched(qid) == scalar,
        s"qid=$qid batched cells ${batched(qid)} != scalar $scalar")
    }
    cent.unpersist()
  }

  test("adcBatch distances are bit-identical to the scalar ADC per query") {
    val dim = 64
    val cbs = PqIndex.codebooks(vecs, dim, m = 8, k = 32, iters = 1)
      .map { case (i, cb) => i -> cb.persist() }
    val codes = PqIndex.encode(vecs, dim, cbs).persist()
    // batched: every (query, vector) candidate pair in one plan
    val cands = codes.crossJoin(queries.select(col("qid")))
      .filter(col("vec_id") =!= col("qid"))
    val batched = PqIndex.adcBatch(queries, dim, cbs, cands)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    seeds.foreach { qid =>
      val scalar = PqIndex.adc(vecs, dim, cbs, codes, qid)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(scalar.nonEmpty && scalar.forall { case (vid, d) =>
        batched((qid, vid)) == d // exact: same lookup values, same sum order
      }, s"qid=$qid batched ADC diverged from scalar")
    }
    codes.unpersist()
    cbs.foreach(_._2.unpersist())
  }
}
