package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.streaming.EventStreams.{Event, SessionUpdate}

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("windowed stream over files equals the batch aggregation up to the watermark") {
    // stage events (with µs timestamps) as a parquet dir for the file source
    val dir = Files.createTempDirectory("graft_stream_in").toString
    val batch = Tables(spark, sfDir, "events")
    batch.write.mode("overwrite").parquet(dir)

    val streamed = EventStreams.windowedCounts(EventStreams.readEventStream(spark, dir))
    val got = EventStreams.runToMemory(spark, streamed, "win_counts")

    // append mode only emits windows whose end <= final watermark
    val maxTs = batch.agg(max(col("ts"))).collect()(0).getTimestamp(0).getTime
    val watermark = maxTs - 2 * 3600 * 1000L
    val expected = batch
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .filter(col("w.end").cast("long") * 1000 <= watermark)
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

    assert(got.count() > 0)
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("sessionize closes sessions on inactivity gap and emits on watermark advance") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapMinutes = 30)

    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName("sessions").start()
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    try {
      // user 1: two bursts 90min apart (-> 2 sessions); user 2: one burst
      input.addData(
        Event(1, t(0), 1L, "view", 1.0),
        Event(2, t(10), 1L, "click", 2.0),
        Event(3, t(100), 1L, "view", 3.0),
        Event(4, t(5), 2L, "view", 5.0))
      q.processAllAvailable()
      // far-future event pushes the watermark past every timeout
      input.addData(Event(9, t(100000), 3L, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(10, t(200000), 3L, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sessions").as[SessionUpdate].collect()
      .map(s => (s.user_id, s.session_start.getTime, s.n_events, s.total_value)).toSet
    // user 1 burst A: events 1,2 (gap 10min); burst B: event 3 (90min later)
    assert(got.contains((1L, t(0).getTime, 2L, 3.0)))
    assert(got.contains((1L, t(100).getTime, 1L, 3.0)))
    assert(got.contains((2L, t(5).getTime, 1L, 5.0)))
  }

  test("sessionize merges out-of-order and bridging events within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapMinutes = 30)

    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName("sessions_ooo").start()
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    try {
      // batch 1 — user 1: two bursts 50min apart (would be 2 sessions);
      // user 2: one event at t(5)
      input.addData(
        Event(1, t(0), 1L, "view", 1.0),
        Event(2, t(50), 1L, "view", 2.0),
        Event(3, t(5), 2L, "view", 5.0))
      q.processAllAvailable()
      // batch 2 — LATE arrivals (watermark still far behind):
      // a bridge at t(25) (25min to both bursts, < gap) fuses user 1's
      // two sessions into one;
      // an earlier event at t(-10) extends user 2's session_start backwards
      input.addData(
        Event(4, t(25), 1L, "view", 4.0),
        Event(5, t(-10), 2L, "view", 7.0))
      q.processAllAvailable()
      // flush: push the watermark past every timeout
      input.addData(Event(9, t(100000), 3L, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(10, t(200000), 3L, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sessions_ooo").as[SessionUpdate].collect()
      .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime,
        s.n_events, s.total_value)).toSet
    // user 1: ONE fused session t(0)..t(50) with all 3 events
    assert(got.contains((1L, t(0).getTime, t(50).getTime, 3L, 7.0)))
    // user 2: start moved back to the late-but-earlier event
    assert(got.contains((2L, t(-10).getTime, t(5).getTime, 2L, 12.0)))
    assert(!got.exists(s => s._1 == 1L && s._4 < 3L), "no eagerly-closed partial session for user 1")
  }

  test("sessionize over the real corpus equals batch session_window for closed sessions") {
    val dir = Files.createTempDirectory("graft_sess_in").toString
    val batch = Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    batch.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .parquet(dir)
      .filter(col("user_id").isNotNull)
      .as[Event]
    val got = EventStreams.runToMemory(
      spark, EventStreams.sessionize(stream, gapMinutes = 30).toDF(), "sess_corpus")

    // batch truth: native session_window (same exclusive-gap semantics),
    // restricted to sessions the final watermark (max ts - 2h) closed
    val maxTs = batch.agg(max(col("ts"))).collect()(0).getTimestamp(0).getTime
    val watermark = maxTs - 2 * 3600 * 1000L
    val expected = batch.filter(col("user_id").isNotNull)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      .filter(unix_micros(col("last_ts")) + lit(30L * 60 * 1000000) <= lit(watermark) * 1000)
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

    val gotKeyed = got.select(col("user_id"), col("session_start"), col("n_events"))
    assert(gotKeyed.count() > 100, s"expected many closed sessions, got ${gotKeyed.count()}")
    assert(gotKeyed.except(expected).isEmpty && expected.except(gotKeyed).isEmpty,
      "streamed sessions diverge from batch session_window")
  }

  test("transformWithState sessionizer (RocksDB store) equals flatMapGroupsWithState") {
    val dir = Files.createTempDirectory("graft_tws_in").toString
    val batch = Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    batch.write.mode("overwrite").parquet(dir)

    def streamIn = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .parquet(dir)
      .filter(col("user_id").isNotNull)
      .as[Event]

    val fmgws = EventStreams.runToMemory(
      spark, EventStreams.sessionize(streamIn, gapMinutes = 30).toDF(), "sess_fmgws")
      .collect().map(_.toSeq).toSet

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tws = EventStreams.runToMemory(
        spark, EventStreams.sessionizeTws(streamIn, gapMinutes = 30).toDF(), "sess_tws")
        .collect().map(_.toSeq).toSet
      assert(tws.size > 100, s"expected many closed sessions, got ${tws.size}")
      assert(tws == fmgws, "timer-driven TWS sessions diverge from flatMapGroupsWithState")
    } finally saved match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }

  test("transformWithState emits due sessions for keys receiving events every batch") {
    // Regression: armTimer used to delete a timer that was already due
    // (<= watermark) but had not fired yet — input rows are processed
    // before expired timers — and re-arm at watermark+1, which cannot fire
    // in the same batch. A key receiving events every micro-batch then
    // never emits its watermark-closed sessions.
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    // no-data batches (default on) mask the bug: the wrongly re-armed
    // timer fires in the empty follow-up batch. At scale a busy key sees
    // data EVERY batch — model that by disabling them.
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val saved = spark.conf.getOption(provKey)
    val savedNoData = spark.conf.getOption(noDataKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(noDataKey, "false")
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionizeTws(input.toDS(), gapMinutes = 30)
    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName("tws_starve").start()
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    try {
      // batch 1: user 1 opens a session at t(0); user 3 pushes the
      // watermark (for batch 2) far past t(0)+gap
      input.addData(
        Event(1, t(0), 1L, "view", 1.0),
        Event(90, t(100000), 3L, "wm", 0.0))
      q.processAllAvailable()
      // batches 2..4: user 1 keeps receiving events EVERY batch while its
      // old session is due; watermark keeps advancing
      for (i <- 1 to 3) {
        input.addData(
          Event(i + 1L, t(100000L + i * 100000L), 1L, "view", 1.0),
          Event(90 + i.toLong, t(100000L + (i + 1) * 100000L), 3L, "wm", 0.0))
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
      savedNoData match {
        case Some(v) => spark.conf.set(noDataKey, v)
        case None => spark.conf.unset(noDataKey)
      }
    }

    val got = spark.table("tws_starve").as[SessionUpdate].collect()
      .filter(_.user_id == 1L).map(s => (s.session_start.getTime, s.n_events)).toSet
    assert(got.contains((t(0).getTime, 1L)),
      s"user 1's t(0) session must emit despite events arriving every batch; got $got")
    assert(got.size >= 3, s"later watermark-closed sessions must emit too; got $got")
  }

  test("streaming dedup emits each key once, suppressing dups across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = EventStreams.dedupStream(input.toDF())

    val q = deduped.writeStream
      .outputMode("append").format("memory").queryName("dedup_stream").start()
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    try {
      // batch 1: event 1 twice (same batch), event 2 once
      input.addData(
        Event(1, t(0), 1L, "view", 1.0),
        Event(1, t(0), 1L, "view", 1.0),
        Event(2, t(5), 2L, "view", 2.0))
      q.processAllAvailable()
      // batch 2: event 1 AGAIN (cross-batch dup, within watermark) + fresh event 3
      input.addData(
        Event(1, t(0), 1L, "view", 1.0),
        Event(3, t(10), 3L, "view", 3.0))
      q.processAllAvailable()
    } finally q.stop()

    val ids = spark.table("dedup_stream").select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L), s"each key exactly once, got $ids")
  }

  test("stream-stream interval join pairs same-user events within the window") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[Event]
    val rIn = MemoryStream[Event]
    val joined = EventStreams.intervalJoin(lIn.toDF(), rIn.toDF(), toleranceMinutes = 10)

    val q = joined.writeStream
      .outputMode("append").format("memory").queryName("ivjoin").start()
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    try {
      lIn.addData(
        Event(1, t(0), 1L, "view", 1.0),
        Event(2, t(0), 2L, "view", 1.0))
      rIn.addData(
        Event(10, t(5), 1L, "click", 1.0),   // within 10min of event 1 (user 1)
        Event(11, t(30), 1L, "click", 1.0),  // outside window
        Event(12, t(4), 3L, "click", 1.0))   // different user
      q.processAllAvailable()
      // advance both watermarks so results flush (distinct users so the
      // flush events can't join each other)
      lIn.addData(Event(98, t(100000), 8L, "view", 0.0))
      rIn.addData(Event(99, t(100000), 9L, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("ivjoin")
      .select(col("l_id"), col("r_id"), col("delta_s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 10L, 300L)))
  }

  test("stream-stream LEFT OUTER join emits unmatched rows after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[Event]
    val rIn = MemoryStream[Event]
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val l = lIn.toDF().select(
      col("event_id").as("l_id"), col("ts").as("l_ts"), col("user_id").as("l_user"))
      .withWatermark("l_ts", "10 minutes")
    val r = rIn.toDF().select(
      col("event_id").as("r_id"), col("ts").as("r_ts"), col("user_id").as("r_user"))
      .withWatermark("r_ts", "10 minutes")
    val joined = l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
    val q = joined.select(col("l_id"), col("r_id")).writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("lojoin").start()
    try {
      // user 1: matched within window; user 2: never matched → must
      // still emit (l_id, NULL) once the watermark passes its window
      lIn.addData(Event(1, t(0), 1L, "a", 1.0), Event(2, t(0), 2L, "a", 1.0))
      rIn.addData(Event(10, t(5), 1L, "b", 1.0))
      q.processAllAvailable()
      // advance both watermarks far past t(10)
      lIn.addData(Event(98, t(1000), 8L, "x", 0.0))
      rIn.addData(Event(99, t(1000), 9L, "x", 0.0))
      q.processAllAvailable()
      lIn.addData(Event(96, t(2000), 8L, "x", 0.0))
      rIn.addData(Event(97, t(2000), 9L, "x", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("lojoin").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got.contains((1L, 10L)), s"matched pair missing: $got")
    assert(got.contains((2L, -1L)),
      s"unmatched left row must emit with NULL right after watermark: $got")
  }

  test("stream-static enrichment join equals the batch join") {
    val dir = Files.createTempDirectory("graft_enrich_in").toString
    val events = Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    events.write.mode("overwrite").parquet(dir)
    val dim = Tables(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

    val stream = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .parquet(dir)
    val enriched = EventStreams.enrichWithDim(stream, dim, "user_id", "c_custkey")
      .select(col("event_id"), col("c_name"))
    val got = EventStreams.runToMemory(spark, enriched, "enriched")

    val expected = events.join(dim, events("user_id") === dim("c_custkey"), "left")
      .select(col("event_id"), col("c_name"))
    assert(got.count() == events.count(), "left join keeps every event")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("streaming upsert merges each micro-batch into the parquet base table") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_upsert").toString + "/base"
    val ckpt = Files.createTempDirectory("graft_upsert_ckpt").toString
    val input = MemoryStream[Event]
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)

    val q = EventStreams.streamingUpsert(
      input.toDF(), base, key = "user_id", orderCol = "ts", checkpointDir = ckpt)
    try {
      // batch 1: three users; user 2 appears twice (latest-in-batch wins)
      input.addData(
        Event(1, t(0), 1L, "a", 10.0),
        Event(2, t(0), 2L, "a", 20.0),
        Event(3, t(5), 2L, "b", 25.0),
        Event(4, t(0), 3L, "a", 30.0))
      q.processAllAvailable()
      val after1 = spark.read.parquet(base)
        .select("user_id", "event_type", "value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(after1 == Set((1L, "a", 10.0), (2L, "b", 25.0), (3L, "a", 30.0)))

      // batch 2: update user 2 again, insert user 4, user 1/3 untouched
      input.addData(
        Event(5, t(10), 2L, "c", 29.0),
        Event(6, t(10), 4L, "a", 40.0))
      q.processAllAvailable()
    } finally q.stop()

    val finalRows = spark.read.parquet(base)
      .select("user_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(finalRows == Set(
      (1L, "a", 10.0), (2L, "c", 29.0), (3L, "a", 30.0), (4L, "a", 40.0)),
      s"upserted table wrong: $finalRows")
  }

  test("partition-scoped upsert rewrites only the partitions a batch touches") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_upsert_part").toString + "/base"
    val ckpt = Files.createTempDirectory("graft_upsert_part_ckpt").toString
    val input = MemoryStream[Event]
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    // day-partition derived from ts; stable per key in this fixture
    val withDay = input.toDF().withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))

    def partFiles(day: String): Set[String] = {
      val d = new java.io.File(s"$base/day=$day")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.isFile).map(_.getName).filter(_.endsWith(".parquet")).toSet
    }

    val q = EventStreams.streamingUpsert(
      withDay, base, key = "user_id", orderCol = "ts", checkpointDir = ckpt,
      partCol = Some("day"))
    try {
      // batch 1: two days (1440 min apart)
      input.addData(
        Event(1, t(0), 1L, "a", 10.0),
        Event(2, t(0), 2L, "a", 20.0),
        Event(3, t(1440), 3L, "a", 30.0))
      q.processAllAvailable()
      // partition type inference reads the string day back as DATE;
      // cast for the assertion (alignTo handles this inside the sink)
      val day1 = spark.read.parquet(base).filter(col("user_id") === 3L)
        .select(col("day").cast("string")).collect().head.getString(0)
      val day0 = spark.read.parquet(base).filter(col("user_id") === 1L)
        .select(col("day").cast("string")).collect().head.getString(0)
      assert(day0 != day1)
      val day1FilesBefore = partFiles(day1)
      assert(day1FilesBefore.nonEmpty)

      // batch 2: touches ONLY day0 (update user 2, insert user 4)
      input.addData(
        Event(4, t(5), 2L, "b", 25.0),
        Event(5, t(5), 4L, "a", 40.0))
      q.processAllAvailable()
      // untouched partition: identical part files (a rewrite would have
      // produced fresh randomized file names)
      assert(partFiles(day1) == day1FilesBefore,
        "batch touching only day0 must not rewrite day1")
    } finally q.stop()

    val finalRows = spark.read.parquet(base)
      .select("user_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(finalRows == Set(
      (1L, "a", 10.0), (2L, "b", 25.0), (3L, "a", 30.0), (4L, "a", 40.0)),
      s"merge semantics across partition-scoped batches wrong: $finalRows")
  }

  test("upsert sink recovers a swap interrupted between rename-aside and move-in") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_upsert_rec").toString + "/base"
    val ckpt = Files.createTempDirectory("graft_upsert_rec_ckpt").toString
    val input = MemoryStream[Event]
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val withDay = input.toDF().withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))

    val q1 = EventStreams.streamingUpsert(
      withDay, base, key = "user_id", orderCol = "ts", checkpointDir = ckpt,
      partCol = Some("day"))
    try {
      input.addData(
        Event(1, t(0), 1L, "a", 10.0),
        Event(2, t(0), 2L, "a", 20.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // simulate the crash window: the live partition was renamed aside to
    // its backup but the staged replacement never moved in
    val dayDir = new java.io.File(base).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day=")).head
    val backup = new java.io.File(base, ".backup-" + dayDir.getName)
    assert(dayDir.renameTo(backup))
    // a plain reader now sees an empty table (dot-dirs are invisible) —
    // the next batch must first restore the backup, then merge
    val q2 = EventStreams.streamingUpsert(
      withDay, base, key = "user_id", orderCol = "ts", checkpointDir = ckpt,
      partCol = Some("day"))
    try {
      input.addData(Event(3, t(5), 2L, "b", 25.0))
      q2.processAllAvailable()
    } finally q2.stop()

    val finalRows = spark.read.parquet(base)
      .select("user_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(finalRows == Set((1L, "a", 10.0), (2L, "b", 25.0)),
      s"crash recovery lost rows: $finalRows")
    assert(!new java.io.File(base, ".backup-" + dayDir.getName).exists(),
      "backup must be cleaned up after the completed swap")
  }

  test("parquet file sink with checkpoint: exactly-once across restart") {
    val inDir = Files.createTempDirectory("graft_ckpt_in").toString
    val outDir = Files.createTempDirectory("graft_ckpt_out").toString + "/silver"
    val ckpt = Files.createTempDirectory("graft_ckpt").toString

    val events = Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val total = events.count()
    val half = events.filter(col("event_id") % 2 === 0)

    // batch 1: half the data, run to completion, stop
    half.write.mode("overwrite").parquet(s"$inDir/b1")
    def stream() = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("pathGlobFilter", "*.parquet")
      .parquet(s"$inDir/*")
    val q1 = EventStreams.toPartitionedParquet(stream(), outDir, ckpt)
    q1.processAllAvailable(); q1.stop()
    val afterB1 = spark.read.parquet(outDir).count()
    assert(afterB1 == half.count())

    // batch 2 arrives; RESTART from the same checkpoint
    events.filter(col("event_id") % 2 =!= 0).write.mode("overwrite").parquet(s"$inDir/b2")
    val q2 = EventStreams.toPartitionedParquet(stream(), outDir, ckpt)
    q2.processAllAvailable(); q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() == total, "restart must pick up only the new batch")
    assert(out.select("event_id").distinct().count() == total, "no duplicates")
    // day-partitioned layout on disk
    val dirs = new java.io.File(outDir).listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_ == "_spark_metadata")
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("event_day=")))
  }
}
