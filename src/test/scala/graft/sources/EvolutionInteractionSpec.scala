package graft.sources

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.{GraftSessions, SparkSpec}

/** Partition evolution × the REST of the engine — the adversarial
  * interaction matrix the 13-case lifecycle spec does not cover:
  * genuinely concurrent appenders racing a REPARTITION (the same
  * optimistic-commit shape that hid the r14 lost-update bug), the
  * commit-log row-feed stream crossing an evolution boundary, and a
  * BUCKETED table evolving its partition layout (bucket tags must
  * survive legacy-partition migration or the whole table silently
  * degrades to unbucketed scans).
  *
  * The write-plane invariant under every interleaving: an append
  * either commits EXACTLY ONCE under a live layout or fails LOUDLY
  * with the stale-layout refusal before its commit — never a silent
  * partial, never rows keyed under a layout the manifest doesn't
  * declare for that key. */
class EvolutionInteractionSpec extends SparkSpec {

  private lazy val s = GraftSessions.withExtensions(spark)

  private def fsOf(base: String) =
    new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def manifest(base: String): SnapshotLog.Manifest =
    SnapshotLog.readManifest(fsOf(base), new Path(base)).get

  private def layoutOf(base: String): String =
    manifest(base).props(SnapshotLog.PartColProp)

  private def readT(base: String): DataFrame =
    s.read.format("graft").load(base)

  private def batchDf(idOff: Long, n: Int): DataFrame = {
    import s.implicits._
    (0 until n).map { i =>
      val id = idOff + i
      (id, s"2024-02-0${(i % 4) + 1}", if (id % 2 == 0) "east" else "west",
        id * 10)
    }.toDF("id", "day", "region", "v")
  }

  test("concurrent appenders racing REPARTITION: exactly-once or loud refusal") {
    val base = Files.createTempDirectory("graft_evrace").toString + "/t"
    batchDf(0L, 40).write.format("graft").partitionBy("day").save(base)

    // Phase A (deterministic): three appenders stage under the layout
    // they resolved BEFORE the evolution commits — every one of their
    // claims must refuse loudly (the table is now ever-evolved), and a
    // re-resolve + retry must commit under the new layout.
    val writers = 3
    val resolved = new CountDownLatch(writers)
    val evolved = new CountDownLatch(1)
    val refused = new AtomicInteger(0)
    val committed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val pool = Executors.newFixedThreadPool(writers)
    val futs = (0 until writers).map { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          val stale = layoutOf(base) // "day", resolved pre-evolution
          resolved.countDown()
          assert(evolved.await(60, TimeUnit.SECONDS))
          val rows = batchDf(1000L + w * 100, 10)
          try {
            SnapshotLog.appendBatch(s, base, rows, stale, batchId = 10 + w)
            fail(s"writer $w committed under stale layout '$stale'")
          } catch {
            case e: IllegalArgumentException
                if e.getMessage.contains("does not match the table's current layout") =>
              refused.incrementAndGet()
          }
          // documented recovery: re-resolve from the manifest, retry
          committed.add(SnapshotLog.appendBatch(
            s, base, rows, layoutOf(base), batchId = 10 + w))
        }
      })
    }
    assert(resolved.await(60, TimeUnit.SECONDS))
    val vEvo = SnapshotLog.repartitionTable(s, base, "region")
    evolved.countDown()
    futs.foreach(_.get(120, TimeUnit.SECONDS))

    assert(refused.get() == writers,
      s"every stale-layout append must refuse; got ${refused.get()}/$writers")
    assert(committed.asScala.toSet.size == writers, "3 distinct commit versions")
    assert(committed.asScala.forall(_ > vEvo))

    // Phase B (racing): appenders loop resolve→append while the main
    // thread evolves region → day → region; a mid-flight evolution may
    // refuse any attempt — the writer re-resolves and retries. Nothing
    // may be lost or doubled.
    val perWriter = 4
    val futs2 = (0 until writers).map { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          (0 until perWriter).foreach { b =>
            val rows = batchDf(5000L + (w * perWriter + b) * 100, 10)
            var done = false
            var guard = 0
            while (!done) {
              try {
                SnapshotLog.appendBatch(
                  s, base, rows, layoutOf(base), batchId = 100 + w * perWriter + b)
                done = true
              } catch {
                case e: IllegalArgumentException
                    if e.getMessage.contains("does not match the table's current layout") =>
                  guard += 1
                  assert(guard < 20, "livelock: layout refusal never cleared")
              }
            }
          }
        }
      })
    }
    SnapshotLog.repartitionTable(s, base, "day")
    SnapshotLog.repartitionTable(s, base, "region")
    futs2.foreach(_.get(240, TimeUnit.SECONDS))
    pool.shutdown()

    // exactness: initial 40 + phase-A 3×10 + phase-B 3×4×10
    val df = readT(base)
    assert(df.count() == 40L + 30L + 120L)
    assert(df.select("id").distinct().count() == 190L)
    // every surviving key decomposes under ITS layout: a region key is
    // east/west, a day key is 2024-02-0N; nothing else may exist
    val m = manifest(base)
    val legal = Set("east", "west",
      "2024-02-01", "2024-02-02", "2024-02-03", "2024-02-04")
    assert(m.files.keySet.subsetOf(legal), m.files.keySet.toString)
    m.files.keySet.foreach { k =>
      val lay = m.keyLayout(k).getOrElse(m.props(SnapshotLog.PartColProp))
      if (lay == "region") assert(Set("east", "west")(k), s"$k under $lay")
      else assert(k.startsWith("2024-02-0"), s"$k under $lay")
    }
    // per-layout pruned read stays exact on the mixed manifest
    assert(readT(base).filter(col("region") === "east").count() ==
      df.filter(col("id") % 2 === 0).count())
  }

  test("row-feed stream crosses a REPARTITION silently; post-evolution appends stream") {
    val base = Files.createTempDirectory("graft_evstream").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_evstream_ck").toString
    batchDf(0L, 8).write.format("graft").partitionBy("day").save(base)
    SnapshotLog.appendBatch(s, base, batchDf(100L, 4), "day", batchId = 2)
    SnapshotLog.repartitionTable(s, base, "region") // file-less commit
    SnapshotLog.appendBatch(
      s, base, batchDf(200L, 4), layoutOf(base), batchId = 3)

    val got = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val q = s.readStream.format("graft").load(base)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.select(col("id")).collect()
          .foreach(r => got.add(java.lang.Long.valueOf(r.getLong(0))))
      }
      .start()
    q.processAllAvailable()
    q.stop()
    // the REPARTITION version delivers NOTHING (untouched files) and
    // fails nothing; both appends' rows arrive exactly once
    assert(got.asScala.map(_.longValue).toSeq.sorted ==
      ((0L until 8L) ++ (100L until 104L) ++ (200L until 204L)).sorted)
  }

  test("bucketed table evolution: tags survive migration, join stays exchange-free") {
    import s.implicits._
    val dir = Files.createTempDirectory("graft_evbkt")
    val base = dir.toString + "/t"
    s.sql("CREATE DATABASE IF NOT EXISTS evbkt")
    s.sql(s"""
      CREATE TABLE evbkt.fact (id BIGINT, day STRING, region STRING, v BIGINT)
      USING graft_snapshot PARTITIONED BY (day) LOCATION '$base'
    """)
    s.sql("ALTER TABLE evbkt_fact SET TBLPROPERTIES " +
      s"('${SnapshotLog.BucketCountProp}' = '4', " +
      s"'${SnapshotLog.BucketColsProp}' = 'id')")
    batchDf(0L, 40).select("id", "day", "region", "v")
      .createOrReplaceTempView("evbkt_src")
    s.sql("INSERT INTO evbkt_fact SELECT * FROM evbkt_src")

    SnapshotLog.repartitionTable(s, base, "region")
    // post-evolution append routes under region AND stays bucketed
    SnapshotLog.appendBatch(s, base, batchDf(500L, 20), "region", batchId = 5)
    val mMixed = manifest(base)
    assert(mMixed.legacyKeys.nonEmpty, "mixed state expected")
    assert(mMixed.allFiles.forall(f => SnapshotLog.bucketIdOf(f).isDefined),
      "every file (legacy and new) must carry its bucket tag:\n" +
        mMixed.allFiles.mkString("\n"))

    // DML across the boundary, then OPTIMIZE migrates legacy partitions
    SnapshotLog.deleteWhere(s, base, col("id") === 3L, "region")
    SnapshotLog.optimizeTable(s, base, "region", minFiles = 2)

    // the registered view PINS the snapshot it was registered at —
    // out-of-band writes (everything above went through the Scala
    // API) do not move it; REFRESH TABLE is the standard remedy and
    // re-resolves the evolved layout from the live manifest
    assert(s.table("evbkt_fact").count() == 40L,
      "registered view must still serve its pinned snapshot")
    s.sql("REFRESH TABLE evbkt_fact").collect()
    assert(s.table("evbkt_fact").count() == 59L,
      "REFRESH must re-pin the view at the live version")
    val mAfter = manifest(base)
    assert(mAfter.legacyKeys.isEmpty, "migration must retire legacy keys")
    assert(mAfter.files.keySet.subsetOf(Set("east", "west")))
    assert(mAfter.allFiles.forall(f => SnapshotLog.bucketIdOf(f).isDefined),
      "migrated files must keep bucket tags — an untagged file degrades " +
        "the whole table to unbucketed scans:\n" + mAfter.allFiles.mkString("\n"))

    // the bucket contract survived: co-bucketed join plans zero shuffles
    val other = Files.createTempDirectory("graft_evbkt2").toString + "/u"
    s.sql(s"""
      CREATE TABLE evbkt.dim (id BIGINT, day STRING, region STRING, v BIGINT)
      USING graft_snapshot PARTITIONED BY (region) LOCATION '$other'
    """)
    s.sql("ALTER TABLE evbkt_dim SET TBLPROPERTIES " +
      s"('${SnapshotLog.BucketCountProp}' = '4', " +
      s"'${SnapshotLog.BucketColsProp}' = 'id')")
    s.sql("INSERT INTO evbkt_dim SELECT * FROM evbkt_src")
    val prior = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = s.table("evbkt_fact").select(col("id"), col("v").as("fv"))
        .join(s.table("evbkt_dim").select(col("id"), col("v").as("dv")), "id")
      val plan = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(j.count() == 39L, "40 matching ids minus the deleted id 3")
      assert(plan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
        s"evolved co-bucketed join must stay exchange-free:\n$plan")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    // rows exact through evolution + delete + migration
    assert(readT(base).count() == 59L)
  }
}
