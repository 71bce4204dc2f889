package graft.operators

import graft.SparkSpec

class MergeUpsertSpec extends SparkSpec {
  import spark.implicits._

  private case class Row3(k: Long, v: Option[Double], s: String)

  test("update replaces, insert appends, untouched rows keep") {
    val base = Seq((1L, Some(10.0), "a"), (2L, Some(20.0), "b"), (3L, Some(30.0), "c"))
      .toDF("k", "v", "s")
    val changes = Seq((2L, Some(99.0), "B"), (4L, Some(40.0), "d"))
      .toDF("k", "v", "s")
    val out = MergeUpsert(base, changes, "k")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2), r.getString(3)))
      .toSet
    assert(out == Set(
      (1L, Some(10.0), "a", "keep"),
      (2L, Some(99.0), "B", "update"),
      (3L, Some(30.0), "c", "keep"),
      (4L, Some(40.0), "d", "insert")))
  }

  test("a change row's genuine NULL wins (no per-column coalesce mixing)") {
    val base = Seq((1L, Some(10.0), "a")).toDF("k", "v", "s")
    // the change NULLs out v — per-column coalesce would resurrect 10.0
    val changes = Seq((1L, Option.empty[Double], "a2")).toDF("k", "v", "s")
    val out = MergeUpsert(base, changes, "k").collect().head
    assert(out.isNullAt(1) && out.getString(2) == "a2" && out.getString(3) == "update")
  }

  test("cdc: deletes remove live keys, absent-key deletes are no-ops, NULL updates survive") {
    val base = Seq((1L, Some(10.0), "a"), (2L, Some(20.0), "b"), (3L, Some(30.0), "c"))
      .toDF("k", "v", "s")
    val changes = Seq(
      (2L, Option.empty[Double], "B", "U"), // NULL update must stick
      (3L, Some(0.0), "x", "D"),            // delete live key
      (9L, Some(0.0), "x", "D"),            // delete absent key: no-op
      (4L, Some(40.0), "d", "U"))           // insert
      .toDF("k", "v", "s", "op")
    val out = MergeUpsert.cdc(base, changes, "k", "op")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2), r.getString(3)))
      .toSet
    assert(out == Set(
      (1L, Some(10.0), "a", "keep"),
      (2L, None, "B", "update"),
      (4L, Some(40.0), "d", "insert")),
      s"cdc result wrong: $out")
  }

  test("output schema is base columns plus merge_action") {
    val base = Seq((1L, Some(1.0), "x")).toDF("k", "v", "s")
    val changes = Seq((2L, Some(2.0), "y")).toDF("k", "v", "s")
    assert(MergeUpsert(base, changes, "k").columns.toSeq ==
      Seq("k", "v", "s", "merge_action"))
  }
}
