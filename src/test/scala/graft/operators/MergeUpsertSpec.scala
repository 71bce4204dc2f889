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

  test("cdc: a NULL op degrades to upsert, never silent row loss") {
    val base = Seq((1L, Some(10.0), "a"), (2L, Some(20.0), "b"))
      .toDF("k", "v", "s")
    // op NULL is outside the {U, D} contract; a non-null-safe compare
    // would make the delete predicate NULL and drop the row entirely
    val changes = Seq((2L, Some(99.0), "B", Option.empty[String]))
      .toDF("k", "v", "s", "op")
    val out = MergeUpsert.cdc(base, changes, "k", "op")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2), r.getString(3)))
      .toSet
    assert(out == Set(
      (1L, Some(10.0), "a", "keep"),
      (2L, Some(99.0), "B", "update")),
      s"NULL-op row must upsert, got: $out")
  }

  test("composite keys: the full column tuple identifies a row") {
    val base = Seq(
      ("A", 1L, 10.0), ("A", 2L, 20.0), ("B", 1L, 30.0))
      .toDF("region", "id", "v")
    // (A,2) updates; (B,2) inserts — a single-column key on either
    // region or id alone would mis-match both
    val changes = Seq(("A", 2L, 99.0), ("B", 2L, 40.0))
      .toDF("region", "id", "v")
    val out = MergeUpsert(base, changes, Seq("region", "id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(out == Set(
      ("A", 1L, 10.0, "keep"),
      ("A", 2L, 99.0, "update"),
      ("B", 1L, 30.0, "keep"),
      ("B", 2L, 40.0, "insert")))
  }

  test("composite-key cdc: delete removes exactly the matching tuple") {
    val base = Seq(("A", 1L, 10.0), ("A", 2L, 20.0), ("B", 1L, 30.0))
      .toDF("region", "id", "v")
    val changes = Seq(
      ("A", 1L, 0.0, "D"),  // delete (A,1) — (B,1) must survive
      ("B", 2L, 40.0, "U")) // insert (B,2)
      .toDF("region", "id", "v", "op")
    val out = MergeUpsert.cdc(base, changes, Seq("region", "id"), "op")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(out == Set(
      ("A", 2L, 20.0, "keep"),
      ("B", 1L, 30.0, "keep"),
      ("B", 2L, 40.0, "insert")),
      s"composite cdc wrong: $out")
  }

  test("output schema is base columns plus merge_action") {
    val base = Seq((1L, Some(1.0), "x")).toDF("k", "v", "s")
    val changes = Seq((2L, Some(2.0), "y")).toDF("k", "v", "s")
    assert(MergeUpsert(base, changes, "k").columns.toSeq ==
      Seq("k", "v", "s", "merge_action"))
  }
}
