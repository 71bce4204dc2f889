package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Int8 scalar-quantization contract on the real embeddings corpus:
  * codes are in range and partitioning-independent, a constant
  * dimension degrades to exact reconstruction (no NaN from the zero
  * scale), the per-dimension |x − x̂| ≤ scale/2 guarantee holds
  * everywhere, and shortlist recall against exact L2 is measured. */
class SqSpec extends SparkSpec {

  graft.functions.GraftFunctions.register(spark)

  private val dim = 64

  private lazy val vecs = Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    .persist()

  private lazy val params = SqIndex.params(vecs, dim)

  test("codes are in [0,255] and cover every vector") {
    val (mins, scales) = params
    val codes = SqIndex.encode(vecs, mins, scales)
    assert(codes.count() == vecs.count())
    val bad = codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") > 255)
    assert(bad.count() == 0)
  }

  test("codes are bit-identical under input repartitioning") {
    val (mins, scales) = params
    val a = SqIndex.encode(vecs, mins, scales).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = SqIndex.encode(vecs.repartition(13), mins, scales).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
  }

  test("per-dimension reconstruction bound holds on every vector") {
    val (mins, scales) = params
    val vhat = SqIndex.decode(SqIndex.encode(vecs, mins, scales), mins, scales)
    val sc = typedlit(scales)
    val slack = vecs.join(vhat, "vec_id")
      .select(aggregate(
        transform(zip_with(col("v"), col("vhat"), (a, b) => abs(a - b)),
          (err, i) => err - element_at(sc, i + 1) / 2),
        lit(0.0), (acc, x) => greatest(acc, x)).as("slack"))
      .agg(max(col("slack"))).head.getDouble(0)
    assert(slack <= 1e-12, s"quantization bound violated by $slack")
  }

  test("a constant dimension reconstructs exactly (zero scale, no NaN)") {
    import spark.implicits._
    val const = Seq(
      (1L, Seq(1.0, 5.0, -2.0)), (2L, Seq(3.0, 5.0, 0.0)), (3L, Seq(2.0, 5.0, 9.0)))
      .toDF("vec_id", "v")
    val (mins, scales) = SqIndex.params(const, 3)
    assert(scales(1) == 0.0)
    val vhat = SqIndex.decode(SqIndex.encode(const, mins, scales), mins, scales)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vhat.values.forall(v => v(1) == 5.0 && !v.exists(_.isNaN)))
  }

  test("distance-from-codes equals distance on the reconstruction") {
    val (mins, scales) = params
    val codes = SqIndex.encode(vecs, mins, scales)
    val vhat = SqIndex.decode(codes, mins, scales)
    val qv = vecs.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val d2hat = IvfIndex.dist2(col("vhat"), col("qv"))
    val relerr = codes.join(vhat, "vec_id").crossJoin(broadcast(qv))
      .select((abs(SqIndex.dist2Codes(col("codes"), col("qv"), mins, scales)
        - d2hat) / greatest(d2hat, lit(1.0))).as("relerr"))
      .agg(max(col("relerr"))).head.getDouble(0)
    assert(relerr < 1e-9, s"SQ identity off by $relerr")
  }

  test("50-shortlist recall of the exact top-10 (measured)") {
    val (mins, scales) = params
    val codes = SqIndex.encode(vecs, mins, scales).persist()
    val recalls = Seq(0L, 7L, 23L).map { qid =>
      val q = vecs.filter(col("vec_id") === qid).select(col("v").as("qv"))
      val shortlist = codes.filter(col("vec_id") =!= qid)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          SqIndex.dist2Codes(col("codes"), col("qv"), mins, scales).as("d2"))
        .orderBy(col("d2"), col("vec_id")).limit(50).select("vec_id")
      val exact = vecs.filter(col("vec_id") =!= qid)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), IvfIndex.dist2(col("v"), col("qv")).as("d2"))
        .orderBy(col("d2"), col("vec_id")).limit(10).select("vec_id")
      shortlist.intersect(exact).count()
    }
    info(s"SQ8 shortlist recall@10 per query (of 10): ${recalls.mkString(", ")}")
    assert(recalls.sum >= 24, s"recall ${recalls.sum}/30 below the 80% floor")
  }
}
