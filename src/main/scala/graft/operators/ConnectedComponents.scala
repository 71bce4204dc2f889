package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed connected components over an edge list — the final stage
  * of a near-dup pipeline: candidate pairs (d6/d7/s6) are edges, each
  * component is one duplicate cluster, and the minimum doc id in the
  * component becomes the cluster's canonical "keeper".
  *
  * Algorithm: iterative min-label propagation (hash-min). Every node
  * starts labeled with itself; each round replaces a node's label with
  * the minimum over its own and its neighbors' labels; fixpoint when no
  * label changes. Each round is one shuffle join (edges ⋈ labels on the
  * neighbor key) + one hash agg — no driver-side data, only the scalar
  * convergence check crosses to the driver.
  *
  * Scale: rounds = graph diameter. Dedup graphs are dense little clique
  * clusters (diameter 2-3), so hash-min converges in a handful of
  * rounds; for adversarial long-chain graphs switch to the
  * large-star/small-star alternation (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14) which is O(log n)
  * rounds with the same join-agg building blocks. Each round ends in an
  * eager `localCheckpoint`: the next label table references the previous
  * one TWICE (directly and through the propagation join), so without
  * lineage truncation the logical plan doubles per round and Catalyst
  * re-analysis goes exponential — caching alone does not help, the
  * optimizer still walks the full plan. (On a cluster with a checkpoint
  * dir, reliable `checkpoint` gives the same truncation plus executor-
  * loss tolerance.) The monotone label sum makes the convergence test a
  * cheap scalar agg instead of a full-table compare.
  */
object ConnectedComponents {

  /** Label every node of the (undirected) edge list with the minimum
    * node id reachable from it.
    *
    * @param edges one row per edge; endpoints castable to long
    * @return (node: long, label: long) — label = min id in the component
    */
  def labels(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 50): DataFrame = {
    val e = edges.select(
      col(srcCol).cast(LongType).as("a"),
      col(dstCol).cast(LongType).as("b"))
    // symmetric closure: propagate both directions with one join per round
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().persist()

    // eager localCheckpoint: materializes AND truncates lineage
    var lbl = sym.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label")).localCheckpoint()
    // labels only ever decrease, so the total strictly drops iff any
    // label changed — one tiny agg instead of a join-compare
    // (coalesce guards the zero-row frame: sum over no rows is NULL)
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).head.getLong(0)
    var prevSum = labelSum(lbl)

    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      val prop = sym.join(lbl, sym("b") === lbl("node"))
        .groupBy(sym("a").as("pnode")).agg(min(col("label")).as("nl"))
      val next = lbl.join(prop, lbl("node") === prop("pnode"), "left")
        .select(
          col("node"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      lbl = next
      converged = nextSum == prevSum
      prevSum = nextSum
      i += 1
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge within $maxIter rounds — " +
          "the graph's diameter exceeds the iteration cap; raise maxIter " +
          "or switch to large-star/small-star for long-chain graphs")
    lbl
  }
}
