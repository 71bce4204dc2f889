package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.GraftFunctions

/** Recall-vs-nprobe curve of the IVF probe path on the real embeddings
  * corpus — the accuracy/cost dial of the flagship ANN operator,
  * measured. Two invariants hold by construction and are asserted
  * exactly: recall@k is monotone non-decreasing in nprobe (a wider
  * probe only adds candidates), and probing every cell recovers the
  * exact brute-force top-k (recall 1.0). The interior of the curve is
  * reported for the record; a floor at nprobe=4 (a quarter of the
  * cells) guards against a degenerate quantizer. */
class IvfRecallSpec extends SparkSpec {

  graft.functions.GraftFunctions.register(spark)

  test("IVF recall@10 is monotone in nprobe and exact at full probe width") {
    val vecs = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .persist()
    val k = 16
    val cent = IvfIndex.centroids(vecs, k = k, iters = 2)
    val queries = Seq(0L, 7L, 23L)

    def exactTopK(qid: Long): Set[Long] = {
      val qv = vecs.filter(col("vec_id") === qid).select(col("v").as("qv"))
      vecs.filter(col("vec_id") =!= qid)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"), GraftFunctions.cosine(col("v"), col("qv")).as("sim"))
        .orderBy(desc("sim"), col("vec_id"))
        .limit(10)
        .collect().map(_.getLong(0)).toSet
    }

    val recalls = for (np <- Seq(1, 2, 4, 8, 16)) yield {
      val r = queries.map { qid =>
        val truth = exactTopK(qid)
        val got = IvfIndex.probe(vecs, cent, qid, nprobe = np, k = 10)
          .collect().map(_.getLong(0)).toSet
        (got intersect truth).size.toDouble / truth.size
      }.sum / queries.size
      np -> r
    }
    info(s"recall@10 by nprobe: ${recalls.map { case (n, r) => f"$n:$r%.2f" }.mkString(" ")}")

    recalls.sliding(2).foreach {
      case Seq((_, a), (npB, b)) =>
        assert(b >= a, s"recall must be monotone in nprobe (dropped at nprobe=$npB)")
      case _ =>
    }
    assert(recalls.last._2 == 1.0, "probing every cell must equal brute force")
    val atQuarter = recalls.find(_._1 == 4).get._2
    assert(atQuarter >= 0.5,
      s"nprobe=4/16 should recover at least half the true top-10, got $atQuarter")
  }
}
