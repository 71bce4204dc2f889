package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SEMANTIC DEDUPLICATION core (SemDeDup, Abbas et al. 2023) with a
  * HOT-CLUSTER guard.
  *
  * The plain within-cluster self-join co-locates each cluster under
  * ONE shuffle key: total work is Σ|c|² (the point of clustering),
  * but a single pathologically hot cluster concentrates |c|² pair
  * work — and an O(|c|) build side — in one task. Production SemDeDup
  * sizes k so clusters stay bounded; this guard makes the bound a
  * property of the PLAN instead of a hope about the data:
  *
  * the "b" (dropped-candidate) side shards into `ceil(|c|/cap)`
  * hash-buckets of ~`cap` vectors, and the "a" side replicates across
  * its cluster's shards — so the join key becomes (label, shard),
  * every task handles ≤ |c|·cap pair evaluations with a ≤ ~cap build
  * side, and each (a, b) pair is still produced EXACTLY once (b lives
  * in exactly one shard; `a.vec_id < b.vec_id` unchanged). Clusters
  * at or under the cap get one shard — the plan is byte-identical to
  * the unguarded join for normal data. Per-cluster shard counts come
  * from one tiny size aggregation, broadcast back.
  *
  * `sim` is the caller's similarity column (s15 passes its strict
  * double-fold cosine so results stay bit-identical to the oracle). */
object SemDeDup {

  /** Distinct (label, vec_id) rows that are semantic duplicates: a
    * LOWER-id vector of the same cluster sits at `sim >= threshold`.
    * `e` must carry (vec_id, label, v). */
  def dups(
      e: DataFrame,
      sim: (Column, Column) => Column,
      threshold: Double,
      shardCap: Int): DataFrame = {
    require(shardCap > 0, "shardCap must be positive")
    val sizes = e.groupBy(col("label")).agg(count(lit(1)).as("__cn"))
      .select(col("label"),
        ceil(col("__cn") / lit(shardCap.toDouble)).cast("int").as("__nsh"))
    val b = e.join(broadcast(sizes), "label")
      .withColumn("__sb",
        pmod(xxhash64(col("vec_id")), col("__nsh").cast("long")).cast("int"))
    val a = e.join(broadcast(sizes), "label")
      .withColumn("__sb", explode(sequence(lit(0), col("__nsh") - 1)))
    a.as("a").join(b.as("b"),
        col("a.label") === col("b.label") &&
          col("a.__sb") === col("b.__sb") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(sim(col("a.v"), col("b.v")) >= threshold)
      .select(col("b.label").as("label"), col("b.vec_id").as("vec_id"))
      .distinct()
  }
}
