package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Product-quantization contract on the real embeddings corpus: codes
  * are well-formed and partitioning-independent, the ADC identity holds
  * on the reconstruction, and shortlist recall against exact L2 is
  * measured and floored. */
class PqSpec extends SparkSpec {

  graft.functions.GraftFunctions.register(spark)

  private val dim = 64

  private lazy val vecs = Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    .persist()

  private lazy val cbs = PqIndex.codebooks(vecs, dim, m = 8, k = 32, iters = 2)

  test("codes are well-formed (m columns in [0,32)) and cover every vector") {
    val codes = PqIndex.encode(vecs, dim, cbs)
    assert(codes.columns.toSeq == "vec_id" +: (0 until 8).map(i => s"c$i"))
    assert(codes.count() == vecs.count())
    val bad = codes.filter(
      (0 until 8).map(i => col(s"c$i") < 0 || col(s"c$i") >= 32).reduce(_ || _))
    assert(bad.count() == 0)
  }

  test("codes are bit-identical under input repartitioning") {
    val a = PqIndex.encode(vecs, dim, cbs).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val b = PqIndex.encode(vecs.repartition(13), dim, cbs).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(a == b)
  }

  test("ADC equals the exact distance to the reconstruction (PQ identity)") {
    val codes = PqIndex.encode(vecs, dim, cbs)
    val vhat = PqIndex.decode(codes, cbs)
    val qv = vecs.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val d2hat = IvfIndex.dist2(col("vhat"), col("qv"))
    val maxRelErr = PqIndex.adc(vecs, dim, cbs, codes, 0L)
      .join(vhat, "vec_id")
      .crossJoin(broadcast(qv))
      .select((abs(col("adc") - d2hat) / greatest(d2hat, lit(1.0))).as("relerr"))
      .agg(max(col("relerr"))).head.getDouble(0)
    assert(maxRelErr < 1e-9, s"ADC diverged from d2(q, reconstruction): $maxRelErr")
  }

  test("ADC 50-shortlist recall of the exact top-10 clears the graded floor") {
    val codes = PqIndex.encode(vecs, dim, cbs)
    val recalls = Seq(0L, 7L, 23L).map { qid =>
      val shortlist = PqIndex.adcTopK(vecs, dim, cbs, codes, qid, topK = 50)
        .collect().map(_.getLong(0)).toSet
      val qv = vecs.filter(col("vec_id") === qid).select(col("v").as("qv"))
      val exact = vecs.filter(col("vec_id") =!= qid)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"), IvfIndex.dist2(col("v"), col("qv")).as("d2"))
        .orderBy(col("d2"), col("vec_id"))
        .limit(10)
        .collect().map(_.getLong(0)).toSet
      (shortlist intersect exact).size / 10.0
    }
    info(f"ADC shortlist-50 recall@10 per query: ${recalls.map(r => f"$r%.1f").mkString(" ")}")
    // iid synthetic embeddings are PQ's worst case (near-equidistant
    // neighbors); the floor is deliberately 3x under the measured values
    // and 8x above what a random 50-shortlist would draw (0.1 of 500)
    assert(recalls.sum / 3 >= 0.2, s"shortlist recall collapsed: $recalls")
  }
}
