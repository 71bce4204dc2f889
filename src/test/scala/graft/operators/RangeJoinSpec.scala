package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed proximity join equals brute force, each pair exactly once") {
    val rnd = new scala.util.Random(11)
    val base = 1700000000000L
    val rows = (1L to 300L).map(i => (i, new Timestamp(base + rnd.nextInt(600000)))) // 10min span
    val df = rows.toDF("event_id", "ts")
    val tol = 15000L

    val got = RangeJoin.proximityPairs(df, "event_id", "ts", tol)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = for {
      (a, ta) <- rows; (b, tb) <- rows
      if a < b && math.abs(ta.getTime - tb.getTime) <= tol
    } yield (a, b, tb.getTime - ta.getTime)

    assert(got.length == got.distinct.length, "no pair may be emitted twice")
    assert(got.toSet == expected.toSet)
    assert(expected.nonEmpty)
  }

  test("boundary: pairs exactly at tolerance are included, one ms over excluded") {
    val df = Seq(
      (1L, new Timestamp(1000000L)),
      (2L, new Timestamp(1000000L + 15000L)),  // exactly tol
      (3L, new Timestamp(1000000L + 30001L))   // 15001 past id 2
    ).toDF("event_id", "ts")
    val got = RangeJoin.proximityPairs(df, "event_id", "ts", 15000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }
}
