package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.queries.TextOps

/** Recall of MinHash-LSH candidate generation against exact n-gram
  * Jaccard on the real corpus. Deterministic: murmur3 hashing is fixed,
  * so observed recall is reproducible run-to-run. */
class MinHashRecallSpec extends SparkSpec {

  test("LSH candidates cover the high-similarity pairs the exact join finds") {
    val docs = Tables(spark, sfDir, "documents")
    val sh = TextOps.shingles(docs)

    // exact Jaccard pairs (same formulation as d6)
    val e = sh.select(col("doc_id"), explode(col("sh")).as("s")).persist()
    val cnt = e.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val exact = e.as("a")
      .join(e.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .agg(count(lit(1)).as("common"))
      .join(cnt.as("ca"), col("x") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("y") === col("cb.doc_id"))
      .select(col("x"), col("y"),
        (col("common") / (col("ca.n") + col("cb.n") - col("common"))).as("j"))

    val truePairs = exact.filter(col("j") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.nonEmpty, "corpus should contain near-duplicate pairs")

    val candidates = MinHashDedup.candidatePairs(sh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val missed = truePairs -- candidates
    assert(missed.isEmpty,
      s"LSH missed ${missed.size}/${truePairs.size} pairs with exact J>=0.8: $missed")
  }
}
