package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.Tables

class IvfIndexSpec extends SparkSpec {

  graft.functions.GraftFunctions.register(spark)

  private def vecs = Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))

  test("assignment partitions the corpus: every vector in exactly one cell") {
    val cent = IvfIndex.centroids(vecs, k = 16, iters = 2)
    val asg = IvfIndex.assign(vecs, cent)
    assert(asg.count() == vecs.count())
    assert(asg.select("vec_id").distinct().count() == vecs.count())
    val cells = asg.select("cid").distinct().count()
    assert(cells > 1 && cells <= 16)
  }

  test("centroids are bit-identical under input repartitioning") {
    val a = IvfIndex.centroids(vecs, k = 8, iters = 2).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    val b = IvfIndex.centroids(vecs.repartition(7), k = 8, iters = 2).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    assert(a.map(_._1).toSeq == b.map(_._1).toSeq)
    a.zip(b).foreach { case ((_, va), (_, vb)) => assert(va == vb) }
  }

  test("probing more cells converges to the brute-force top-k") {
    import spark.implicits._
    val cent = IvfIndex.centroids(vecs, k = 8, iters = 1)
    val qv = vecs.filter(col("vec_id") === 0).select(col("v").as("qv"))
    def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.GraftFunctions.dot(a, b) /
        (sqrt(graft.functions.GraftFunctions.dot(a, a)) * sqrt(graft.functions.GraftFunctions.dot(b, b)))
    val brute = vecs.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
      .select(col("vec_id"), cos(col("v"), col("qv")).as("sim"))
      .orderBy(desc("sim"), col("vec_id")).limit(5)
      .select("vec_id").as[Long].collect().toSet
    // probe ALL cells -> IVF must equal brute force exactly
    val allCells = IvfIndex.assign(vecs, cent)
      .filter(col("vec_id") =!= 0)
      .join(vecs, Seq("vec_id")).crossJoin(broadcast(qv))
      .select(col("vec_id"), cos(col("v"), col("qv")).as("sim"))
      .orderBy(desc("sim"), col("vec_id")).limit(5)
      .select("vec_id").as[Long].collect().toSet
    assert(allCells == brute, "IVF with nprobe=k is exact")
  }
}
