package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("leftAsOf picks the latest right row at or before each left ts, per key") {
    val left = Seq(
      (1L, ts("2024-01-10 00:00:00"), "e1"),
      (1L, ts("2024-01-20 00:00:00"), "e2"),
      (2L, ts("2024-01-05 00:00:00"), "e3"),
      (3L, ts("2024-01-05 00:00:00"), "e4") // key with no right rows
    ).toDF("k", "t", "eid")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), 100.0),
      (1L, ts("2024-01-15 00:00:00"), 150.0),
      (2L, ts("2024-01-05 00:00:00"), 200.0), // equal ts → inclusive match
      (2L, ts("2024-01-06 00:00:00"), 250.0)  // after left ts → excluded
    ).toDF("k", "t", "payload")

    val out = AsOfJoin.leftAsOf(
      left, right, leftKey = "k", rightKey = "k", leftTs = "t", rightTs = "t",
      rightPayload = Seq("payload"))
      .select("eid", "payload").collect().map(r => r.getString(0) -> r.get(1)).toMap

    assert(out("e1") == 100.0)
    assert(out("e2") == 150.0)
    assert(out("e3") == 200.0) // inclusive at equal timestamp
    assert(out("e4") == null)  // no prior right row
  }
}
