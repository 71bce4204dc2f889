package graft.queries

import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec}

/** s21's curve must be internally consistent: candidates(np) ⊆
  * candidates(np+1) and anything that outranks an exact-top-3 member
  * would itself be exact-top-3, so filtered recall is monotone
  * non-decreasing in nprobe — per sweep point, not just on average. */
class FilteredRecallSpec extends SparkSpec {

  test("filtered recall@3 is monotone non-decreasing in nprobe") {
    val rows = Registry.byName("s21_filtered_recall").build(spark, sfDir)
      .orderBy(col("nprobe"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    rows.sliding(2).foreach { case Array((np1, r1, p1), (np2, r2, p2)) =>
      assert(r2 >= r1, s"mean recall dropped from nprobe=$np1 ($r1) to $np2 ($r2)")
      assert(p2 >= p1, s"perfect count dropped from nprobe=$np1 ($p1) to $np2 ($p2)")
    }
    // the curve must saturate: probing all 4 ranked cells of a 16-cell
    // index over this corpus reaches a nonzero floor
    assert(rows.last._2 > 0L, "recall@3 at nprobe=4 should be positive")
  }
}
