package graft.plans

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}
import graft.sources.{Catalog, SnapshotLog}

/** Subquery conditions in SQL DELETE/UPDATE on commit-log tables —
  * the shapes a re-parseable `expr()` string cannot carry. The rule
  * wraps the condition in [[DmlCond]] and the executor re-analyzes it
  * as a plan-level Filter over the live frame
  * ([[SnapshotDml.planPredicate]]), so Catalyst's own
  * RewritePredicateSubquery builds the joins: semi for IN/EXISTS,
  * anti for NOT EXISTS, NULL-AWARE anti for NOT IN. The two selectors
  * (matches = TRUE rows, keeps = FALSE-or-NULL rows) partition the
  * frame exactly, which the totals below prove. */
class SubqueryDmlSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  private def freshTable(name: String): (String, String) = {
    import s.implicits._
    val base = Files.createTempDirectory(s"graft_subdml_$name").toString + "/tbl"
    // ids 1..100, cust = id % 10 (so cust 0..9), day = d0/d1/d2
    val rows = (1L to 100L).map(i => (i, i % 10, i * 2.0, s"d${i % 3}"))
      .toDF("id", "cust", "value", "day")
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 4, opCol = None, writeCdf = false)
    (base, Catalog.registerSnapshotLog(s, "subdml", name, base, Some("day")))
  }

  test("IN subquery DELETE takes the DV path and deletes exactly the semi-join rows") {
    import s.implicits._
    val (base, view) = freshTable("t_in")
    Seq(2L, 5L).toDF("c").createOrReplaceTempView("subdml_hot")
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val m1 = SnapshotLog.readManifest(fs, bp).get

    s.sql(s"DELETE FROM $view WHERE cust IN (SELECT c FROM subdml_hot)")
    val m2 = SnapshotLog.readManifest(fs, bp).get
    assert(m2.files == m1.files && m2.dvs.nonEmpty,
      "row-level subquery DELETE must commit deletion vectors")
    // 100 ids, cust = id%10 ∈ {2,5} → 20 deleted
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 80)
    assert(s.sql(s"SELECT COUNT(*) FROM $view WHERE cust IN (2,5)")
      .head.getLong(0) == 0)
  }

  test("correlated EXISTS with a statement alias deletes through the qualifier strip") {
    import s.implicits._
    val (_, view) = freshTable("t_exists")
    Seq((2L, "keep"), (7L, "kill")).toDF("c", "tag")
      .createOrReplaceTempView("subdml_tags")
    s.sql(s"DELETE FROM $view AS t WHERE EXISTS " +
      "(SELECT 1 FROM subdml_tags g WHERE g.c = t.cust AND g.tag = 'kill')")
    assert(s.sql(s"SELECT COUNT(*) FROM $view WHERE cust = 7").head.getLong(0) == 0)
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 90)
  }

  test("NOT IN is null-aware: a NULL in the subquery makes the DELETE a no-op") {
    import s.implicits._
    val (base, view) = freshTable("t_notin")
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq(Some(1L), None, Some(3L)).toDF("c")
      .createOrReplaceTempView("subdml_nullset")
    val v0 = SnapshotLog.readManifest(fs, bp).get.version
    s.sql(s"DELETE FROM $view WHERE cust NOT IN (SELECT c FROM subdml_nullset)")
    assert(SnapshotLog.readManifest(fs, bp).get.version == v0,
      "NOT IN over a null-bearing set is never TRUE — nothing may commit")
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 100)

    // without the NULL the same statement deletes the complement
    Seq(1L, 3L).toDF("c").createOrReplaceTempView("subdml_nonull")
    s.sql(s"DELETE FROM $view WHERE cust NOT IN (SELECT c FROM subdml_nonull)")
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == 20)
    assert(s.sql(s"SELECT COUNT(*) FROM $view WHERE cust NOT IN (1,3)")
      .head.getLong(0) == 0)
  }

  test("UPDATE with correlated EXISTS rewrites exactly the matching rows") {
    import s.implicits._
    val (base, view) = freshTable("t_upd")
    Seq(4L).toDF("c").createOrReplaceTempView("subdml_upd_set")
    s.sql(s"UPDATE $view SET value = value + 1000 WHERE EXISTS " +
      "(SELECT 1 FROM subdml_upd_set u WHERE u.c = cust)")
    // ids with id%10=4: value was id*2 → now id*2+1000
    assert(s.sql(s"SELECT SUM(value) FROM $view WHERE cust = 4")
      .head.getDouble(0) ==
      (1L to 100L).filter(_ % 10 == 4).map(_ * 2.0 + 1000).sum)
    assert(s.sql(s"SELECT SUM(value) FROM $view WHERE cust <> 4")
      .head.getDouble(0) ==
      (1L to 100L).filter(_ % 10 != 4).map(_ * 2.0).sum)
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(SnapshotLog.readManifest(fs, bp).get.op.contains("UPDATE"))
  }

  test("NOT EXISTS and AND-mixed conditions compose with plain predicates") {
    import s.implicits._
    val (_, view) = freshTable("t_mixed")
    Seq(0L, 1L, 2L, 3L, 4L).toDF("c").createOrReplaceTempView("subdml_low")
    // delete rows with no match in subdml_low (cust 5..9) AND id > 50
    s.sql(s"DELETE FROM $view WHERE NOT EXISTS " +
      "(SELECT 1 FROM subdml_low l WHERE l.c = cust) AND id > 50")
    val expected = (1L to 100L).count(i => !(i % 10 >= 5 && i > 50))
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) == expected)
  }

  test("IN subquery on the partition column still plans metadata-only") {
    import s.implicits._
    val (base, view) = freshTable("t_meta")
    Seq("d1").toDF("dy").createOrReplaceTempView("subdml_days")
    val bp = new Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val res = s.sql(
      s"DELETE FROM $view WHERE day IN (SELECT dy FROM subdml_days)")
      .collect().head
    assert(res.getBoolean(2), "partition IN-subquery must be metadata-only")
    val m = SnapshotLog.readManifest(fs, bp).get
    assert(!m.files.contains("d1"))
    assert(s.sql(s"SELECT COUNT(*) FROM $view").head.getLong(0) ==
      (1L to 100L).count(_ % 3 != 1))
  }

  test("a subquery in an UPDATE assignment falls through loudly (unsupported)") {
    import s.implicits._
    val (_, view) = freshTable("t_badset")
    Seq(1L).toDF("c").createOrReplaceTempView("subdml_one")
    intercept[Exception] {
      s.sql(s"UPDATE $view SET value = (SELECT MAX(c) FROM subdml_one)")
    }
  }
}
