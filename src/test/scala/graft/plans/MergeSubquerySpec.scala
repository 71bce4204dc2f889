package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}
import graft.sources.{Catalog, SnapshotLog}

/** Subquery conditions in MERGE WHEN clauses: IN and correlated EXISTS
  * compile into boolean columns over the merge join (Spark admits
  * IN/EXISTS only in a Filter), with first-true-wins clause order and
  * the exact FALSE/NULL complement preserved. Plus the regression that
  * motivated `planPredicate`'s complement form: a NULL probe column
  * must never vanish from both selector sides. */
class MergeSubquerySpec extends SparkSpec {
  private lazy val s = GraftSessions.withExtensions(spark)

  private def mk(n: String): String = {
    import s.implicits._
    val base = Files.createTempDirectory(s"graft_msub_$n").toString + "/tbl"
    val rows = (1L to 20L).map(i => (i, i * 1.0, s"d${i % 2}"))
      .toDF("id", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    Catalog.registerSnapshotLog(s, "msub", n, base, Some("day"))
  }

  test("IN + correlated EXISTS clause conditions, clause order, inserts survive") {
    import s.implicits._
    val v = mk("arms")
    Seq((2L, 0.5, "d0"), (4L, 0.5, "d0"), (6L, 0.5, "d0"),
        (101L, 9.0, "d1"), (102L, 9.0, "d0"))
      .toDF("id", "value", "day").createOrReplaceTempView("msub_src")
    Seq(Tuple1(4L)).toDF("k").createOrReplaceTempView("msub_del")
    Seq((6L, 100.0)).toDF("k", "v").createOrReplaceTempView("msub_flag")
    s.sql(s"""
      MERGE INTO $v t USING msub_src s ON t.id = s.id
      WHEN MATCHED AND t.id IN (SELECT k FROM msub_del) THEN DELETE
      WHEN MATCHED AND EXISTS (SELECT 1 FROM msub_flag f
                               WHERE f.k = t.id AND f.v > s.value)
        THEN UPDATE SET value = s.value + 1
      WHEN MATCHED THEN UPDATE SET value = s.value + 2
      WHEN NOT MATCHED THEN INSERT *
    """)
    val out = s.sql(s"SELECT id, value FROM $v ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(4L), s"id 4 must take the IN-delete arm: $out")
    assert(out(6L) == 1.5, s"id 6 must take the EXISTS arm: $out")
    assert(out(2L) == 2.5, s"id 2 must take the fallback arm: $out")
    assert(out(101L) == 9.0 && out(102L) == 9.0,
      s"NOT MATCHED inserts must survive the subquery splits: $out")
    assert(out(3L) == 3.0, "untouched row must stay")
    assert(out.size == 20 - 1 + 2, s"row count: ${out.size}")
  }

  test("subquery in a MERGE assignment VALUE still refuses (falls through loudly)") {
    import s.implicits._
    val v = mk("asg")
    Seq((2L, 0.5, "d0")).toDF("id", "value", "day")
      .createOrReplaceTempView("msub_asrc")
    intercept[Exception] {
      s.sql(s"""
        MERGE INTO $v t USING msub_asrc s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET value = (SELECT MAX(k) FROM msub_del)
      """)
    }
  }

  test("planPredicate complement: NULL probe rows stay on the keeps side") {
    import s.implicits._
    // the regression: COALESCE(NOT(x IN sub), TRUE) planned as a
    // null-aware anti join dropped NULL-probe rows from BOTH selector
    // sides — deleteWhere's keeps would silently LOSE rows with a
    // NULL key. The NOT(COALESCE(cond, FALSE)) form keeps them.
    val base = Files.createTempDirectory("graft_msub_null").toString + "/tbl"
    val rows = Seq((1L, Option(10L), "d0"), (2L, Option(20L), "d1"),
        (3L, None: Option[Long], "d0"))
      .toDF("id", "ref", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    val v = Catalog.registerSnapshotLog(s, "msub", "nul", base, Some("day"))
    Seq(Tuple1(20L)).toDF("k").createOrReplaceTempView("msub_refs")
    s.sql(s"DELETE FROM $v WHERE ref IN (SELECT k FROM msub_refs)")
    val left = s.sql(s"SELECT id FROM $v ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(left == Seq(1L, 3L),
      s"only id 2 matches; the NULL-ref row must SURVIVE the delete: $left")
  }
}
