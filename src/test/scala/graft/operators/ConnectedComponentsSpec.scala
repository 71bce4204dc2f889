package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.labels(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, clique, and isolated pair each collapse to their min id") {
    // components: {1..4} chain, {10,11,12} triangle, {20,21}
    val lbl = run(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)))
    assert(lbl == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long chain converges past a single propagation round") {
    // path of 12 nodes: min label must travel 11 hops (descending edge
    // order makes the label flow against the edge direction)
    val lbl = run((1L to 11L).map(i => (i, i + 1)))
    assert(lbl.values.toSet == Set(1L))
    assert(lbl.keySet == (1L to 12L).toSet)
  }

  test("labels are invariant to edge direction and duplication") {
    val forward = run(Seq((5L, 6L), (6L, 7L)))
    val scrambled = run(Seq((7L, 6L), (6L, 5L), (5L, 6L), (6L, 7L)))
    assert(forward == scrambled)
  }
}
