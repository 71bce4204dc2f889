package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming surface over the `events` shape.
  *
  * The reference is batch *triggered by* events (S3 `_READY` →
  * EventBridge → Step Function, ref `infrastructure/main.tf:812-850`;
  * SURVEY.md §2.9) — its incremental folder reads are exactly the file
  * source's model, so the same transforms run as a stream with zero
  * operator changes. These are the streaming analogs of the batch
  * queries (q21 ↔ [[windowedCounts]]) plus the stateful surface Spark
  * adds: watermarked tumbling windows and session windows via
  * `flatMapGroupsWithState`.
  *
  * Scale: state is keyed by (window, event_type) / user — bounded by the
  * watermark horizon, not stream length; the state store shards across
  * executors with the shuffle partitioning.
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionUpdate(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)

  /** Per-user session accumulator (public: the state encoder's generated
    * code needs constructor access). */
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** All live (not-yet-watermark-closed) sessions of one user, disjoint
    * intervals. Plural because out-of-order arrival within the watermark
    * horizon can keep several open sessions per key at once. */
  final case class SessionBuffer(sessions: Seq[SessionState])

  /** File-source stream over an events directory (schema-locked; the
    * batch and stream plans are the same operators). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)

  /** Tumbling 1-hour windowed counts with a 2-hour watermark — the
    * streaming analog of q21_hourly_events. Append mode: a window only
    * emits once the watermark passes its end (exactly-once per window). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Event-time sessionization: per-user sessions that close after
    * `gapMinutes` of inactivity, implemented with
    * `flatMapGroupsWithState` + event-time timeout.
    *
    * Robust to out-of-order arrival within the watermark horizon: state is
    * a set of disjoint session intervals per user, and each event merges
    * every session it touches (an early-arriving event extends
    * session_start backwards; a late bridge event fuses two sessions into
    * one). A session is emitted ONLY once the watermark passes
    * `last + gap` — at that point no admissible event can still merge with
    * it, so emission is final (append-mode safe). Eager emission on a
    * newer event would be wrong: a late bridge inside the allowed lateness
    * could retroactively extend the "closed" session.
    *
    * Gap boundary matches batch `session_window` (q33): the end is
    * exclusive, an event exactly `gap` after the last one opens a NEW
    * session. That exclusivity is also what makes watermark-close final:
    * events with ts ≥ watermark ≥ last+gap cannot merge.
    *
    * State per user is O(sessions in the watermark horizon), each O(1) —
    * bounded by lateness horizon / gap, not stream length. */
  /** Timestamp ↔ epoch-MICROsecond conversions: `Timestamp.getTime` is
    * milliseconds and would truncate the corpus's µs components —
    * session boundaries and emitted starts must match batch
    * `session_window` (µs-exact), so all state arithmetic runs in µs. */
  private def toMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def toTimestamp(us: Long): Timestamp = {
    val secs = Math.floorDiv(us, 1000000L)
    val ts = new Timestamp(secs * 1000L)
    ts.setNanos(((us - secs * 1000000L) * 1000L).toInt)
    ts
  }

  /** Merge one event into the disjoint session set: absorb every session
    * whose gap-extended OPEN interval (start−gap, last+gap) contains t —
    * possibly several (a bridge event fuses them). Interval-union is
    * order-independent: any arrival order of the same events yields the
    * same session set (property-tested in GraftProps). Package-visible
    * for exactly that test. */
  private[streaming] def absorb(
      sessions: List[SessionState], t: Long, v: Double, gapUs: Long): List[SessionState] = {
    val (touch, rest) = sessions.partition(s => t > s.start - gapUs && t < s.last + gapUs)
    val merged = SessionState(
      start = (t :: touch.map(_.start)).min,
      last = (t :: touch.map(_.last)).max,
      n = touch.map(_.n).sum + 1,
      total = touch.map(_.total).sum + v)
    merged :: rest
  }

  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int = 30): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def update(
        userId: Long,
        rows: Iterator[Event],
        state: GroupState[SessionBuffer]): Iterator[SessionUpdate] = {
      var sessions = state.getOption.map(_.sessions.toList).getOrElse(Nil)
      rows.foreach(e => sessions = absorb(sessions, toMicros(e.ts), e.value, gapUs))

      // Spark's watermark advances in ms; admitted events have
      // ts_us >= wm_ms*1000, so a session is safely final once
      // last + gap <= wm_ms*1000 (exclusive gap ⇒ no further merge).
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (due, live) = sessions.partition(_.last + gapUs <= wmUs)
      if (live.nonEmpty) {
        state.update(SessionBuffer(live))
        // next closure candidate (ms, rounded up); strictly above the watermark
        val nextMs = (live.map(_.last + gapUs).min + 999L) / 1000L
        state.setTimeoutTimestamp(math.max(nextMs, state.getCurrentWatermarkMs() + 1))
      } else state.remove()

      due.sortBy(_.start).iterator.map(s =>
        SessionUpdate(userId, toTimestamp(s.start), toTimestamp(s.last), s.n, s.total))
    }

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** The same sessionization on the `transformWithState` API (Spark 4's
    * arbitrary-stateful-processing successor to flatMapGroupsWithState):
    * typed `ValueState` holds the open-session intervals, and emission
    * moves to explicit event-time TIMERS — `handleInputRows` only absorbs
    * and (re)arms a timer at the earliest possible close, and sessions
    * are emitted from `handleExpiredTimer` once the watermark passes
    * `last + gap`. Same watermark-close-only semantics as [[sessionize]]
    * (proven equal in EventStreamsSpec), but state lives in the RocksDB
    * state store (`spark.sql.streaming.stateStore.providerClass` must be
    * RocksDBStateStoreProvider — transformWithState requires it), which
    * is the at-scale store: state spills off-heap and snapshots
    * incrementally instead of living on the JVM heap. */
  private class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, Event, SessionUpdate] {
    @transient private var buf: ValueState[SessionBuffer] = _
    // the timestamp of the currently-armed timer, so re-arming can delete
    // the superseded one — otherwise stale timers accumulate per key in
    // the state store (one per batch that touched the key), each firing a
    // no-op handleExpiredTimer
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getValueState[SessionBuffer](
        "sessions", Encoders.product[SessionBuffer], TTLConfig.NONE)
      armed = getHandle.getValueState[Long](
        "armedTimer", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def live: List[SessionState] =
      if (buf.exists()) buf.get().sessions.toList else Nil

    private def armTimer(sessions: List[SessionState], tv: TimerValues): Unit = {
      // next closure candidate (ms, rounded up); strictly above the watermark
      val nextMs = (sessions.map(_.last + gapUs).min + 999L) / 1000L
      val target = math.max(nextMs, tv.getCurrentWatermarkInMs + 1)
      val prev = if (armed.exists()) Some(armed.get()) else None
      prev match {
        // An already-due timer (<= watermark) has NOT fired yet when input
        // rows are being processed — transformWithState handles input rows
        // before expired timers. Deleting it here would replace it with one
        // at watermark+1 that cannot fire this batch; a key receiving
        // events every micro-batch would then starve session emission
        // forever. Leave it: handleExpiredTimer emits the due sessions,
        // clears `armed`, and re-arms for whatever stays open.
        case Some(p) if p <= tv.getCurrentWatermarkInMs => ()
        case Some(p) if p == target => ()
        case _ =>
          prev.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(target)
          armed.update(target)
      }
    }

    override def handleInputRows(
        key: Long, rows: Iterator[Event], tv: TimerValues): Iterator[SessionUpdate] = {
      var sessions = live
      rows.foreach(e => sessions = absorb(sessions, toMicros(e.ts), e.value, gapUs))
      buf.update(SessionBuffer(sessions))
      armTimer(sessions, tv)
      Iterator.empty // emission is timer-driven only
    }

    override def handleExpiredTimer(
        key: Long, tv: TimerValues, info: ExpiredTimerInfo): Iterator[SessionUpdate] = {
      // the firing timer is gone from the store; forget it before re-arming
      if (armed.exists() && armed.get() == info.getExpiryTimeInMs) armed.clear()
      val wmUs = tv.getCurrentWatermarkInMs * 1000L
      val (due, open) = live.partition(_.last + gapUs <= wmUs)
      if (open.nonEmpty) { buf.update(SessionBuffer(open)); armTimer(open, tv) }
      else { buf.clear(); armed.clear() }
      due.sortBy(_.start).iterator.map(s =>
        SessionUpdate(key, toTimestamp(s.start), toTimestamp(s.last), s.n, s.total))
    }
  }

  def sessionizeTws(
      events: Dataset[Event],
      gapMinutes: Int = 30): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor(gapMinutes * 60L * 1000000L),
        TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Streaming exact dedup — the streaming form of the batch d1
    * operator for a continuously-ingesting pipeline. Emits the first
    * arrival of each key immediately (append mode) and suppresses
    * re-arrivals; `dropDuplicatesWithinWatermark` bounds the seen-keys
    * state store by the watermark horizon instead of stream length
    * (plain dropDuplicates on a stream would accumulate state forever).
    * Duplicates farther apart than the lateness horizon are beyond any
    * watermarked operator's contract — dedupe those in a batch
    * compaction pass (d1). */
  def dedupStream(
      events: DataFrame,
      idCols: Seq[String] = Seq("event_id"),
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Stream-stream interval join: pair each left event with right events
    * of the same user within `toleranceMinutes` AFTER it. Both sides
    * watermarked — Spark bounds the join state buffer by the watermark +
    * interval, so state is O(rate × horizon), not stream length. The
    * batch analog is q27's bucketed range join. */
  def intervalJoin(
      left: DataFrame, right: DataFrame, toleranceMinutes: Int): DataFrame = {
    val l = left.select(
      col("event_id").as("l_id"), col("user_id").as("l_user"), col("ts").as("l_ts"))
      .withWatermark("l_ts", "2 hours")
    val r = right.select(
      col("event_id").as("r_id"), col("user_id").as("r_user"), col("ts").as("r_ts"))
      .withWatermark("r_ts", "2 hours")
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $toleranceMinutes MINUTES") &&
        col("l_id") =!= col("r_id"))
      .select(col("l_id"), col("r_id"), col("l_user").as("user_id"),
        (col("r_ts").cast("long") - col("l_ts").cast("long")).as("delta_s"))
  }

  /** Stream-static enrichment join: every micro-batch of the stream
    * joins the static dimension — stateless (no watermark needed; the
    * static side is re-planned per batch, so dim updates between
    * batches are picked up). With a small dim Catalyst broadcasts it,
    * i.e. the streaming form of the reference's fact ⟕ broadcast(dim)
    * join (`glue_jobs/etl_job.py:68-71`). */
  def enrichWithDim(
      events: DataFrame,
      dim: DataFrame,
      eventKey: String,
      dimKey: String): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim),
      events(eventKey) === dim(dimKey), "left")

  /** Continuous Bronze→Silver: stream events into day-partitioned parquet
    * with a checkpoint. The file sink + checkpoint give exactly-once
    * delivery across restarts — the streaming form of the reference's
    * incremental folder batches (`_READY`-triggered reruns can't
    * double-ingest). */
  def toPartitionedParquet(
      events: DataFrame,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withColumn("event_day", to_date(col("ts")))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .partitionBy("event_day")
      .outputMode(OutputMode.Append)
      .format("parquet")
      .start(outDir)

  /** Streaming MERGE: apply each micro-batch as a row-level upsert into
    * a parquet-backed base table — `foreachBatch` +
    * [[graft.operators.MergeUpsert]], the streaming form of q57 and the
    * CDC-sink pattern (the reference's TRUNCATE+COPY full refresh,
    * shrunk to per-batch row-level changes).
    *
    * Semantics: within a batch, latest `orderCol` wins per key; across
    * batches, the change row replaces the base row wholesale (the
    * struct-pick preserves intentional NULL updates).
    *
    * Sink layout and crash safety: all filesystem access goes through
    * the Hadoop [[org.apache.hadoop.fs.FileSystem]] resolved from
    * `basePath`. The swap never deletes live data before its
    * replacement is in place: the old snapshot (or partition) is
    * renamed aside to a dot-prefixed backup (invisible to Spark
    * readers), the staged replacement is renamed in, and only then is
    * the backup deleted. Every batch begins by repairing any swap a
    * crash interrupted — a missing live dir with a surviving backup is
    * restored, a stale backup next to a live dir is dropped — and
    * `foreachBatch` then replays the batch, which converges because
    * the upsert is idempotent per key: the at-least-once contract with
    * no window in which the base table can be lost. The no-loss
    * guarantee is as strong as the filesystem's rename: atomic on
    * HDFS and local filesystems; on S3A rename is a non-atomic
    * copy+delete, so a crash mid-rename can leave a partial dir —
    * there the honest choice is a commit-log table format
    * (Iceberg/Delta) carrying this same merge operator.
    *
    * Scale: per batch, one shuffle of base ∪ changes on the key (bucket
    * the base at 100 TB so only the change set shuffles). With `partCol`
    * set, the base is day-partitioned and each batch rewrites ONLY the
    * partitions its change keys live in — per-batch IO is O(changed
    * partitions), not O(base). `partCol` must be non-null and stable
    * per key (the standard CDC day-partition contract: a key's
    * partition value never changes across updates). Without `partCol`
    * the whole snapshot rewrites per batch — only for small dimension
    * tables; a transactional table format (Iceberg/Delta commit log)
    * is the row-level-commit upgrade, the merge operator is unchanged. */
  def streamingUpsert(
      events: DataFrame,
      basePath: String,
      key: String,
      orderCol: String,
      checkpointDir: String,
      partCol: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val sp = batch.sparkSession
        val base = new org.apache.hadoop.fs.Path(basePath)
        val fs = base.getFileSystem(sp.sparkContext.hadoopConfiguration)
        recoverSnapshots(fs, base)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(key)).orderBy(desc(orderCol))
        val changes = batch
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        partCol match {
          case None     => fullSnapshotUpsert(sp, fs, base, changes, key, id)
          case Some(pc) => partitionScopedUpsert(sp, fs, base, changes, key, pc, id)
        }
        ()
      }
      .start()

  /** The commit-log variant of [[streamingUpsert]]: each micro-batch
    * merges into a [[graft.sources.SnapshotLog]] table instead of a
    * directory snapshot. Readers pin a manifest version, commits are a
    * single small-file rename (atomic-visible even on object stores
    * where directory renames are copy+delete), a crashed batch leaves
    * only never-referenced orphans, and a replay converges because the
    * merge is idempotent per key. Per-batch IO stays O(changed
    * partitions). Read the result with `SnapshotLog.read`.
    *
    * `statsCols` flows through to the manifest's per-file min/max
    * bounds, so a continuously-ingesting table stays range-prunable
    * ([[graft.sources.SnapshotLog.readRange]]) with no extra pass.
    *
    * `writeCdf = true` additionally materializes each committed
    * version's change feed (`_cdf/v*`) so DOWNSTREAM streams can tail
    * this table with [[graft.sources.SnapshotLog.tailCdf]] — chaining
    * pipelines stream→table→stream without re-reading snapshots. A
    * replayed micro-batch (at-least-once upstream) merges idempotently
    * and its CDF version is simply EMPTY — downstream delta consumers
    * are unaffected. */
  def streamingUpsertLog(
      events: DataFrame,
      basePath: String,
      key: String,
      orderCol: String,
      checkpointDir: String,
      partCol: String,
      statsCols: Seq[String] = Nil,
      writeCdf: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.sources.SnapshotLog.upsertBatch(
          batch.sparkSession, basePath, batch, Seq(key), orderCol, partCol, id,
          maxRetries = 5, statsCols = statsCols, clusterBy = Nil,
          clusterFiles = 16, opCol = None, writeCdf = writeCdf)
        ()
      }
      .start()

  private val BackupPrefix = ".backup-"

  /** Repair any snapshot swap a crash interrupted: a live dir that went
    * missing after its backup was renamed aside is restored; a backup
    * that survived a completed swap is deleted. Covers both the
    * full-snapshot layout (backup beside the base dir) and the
    * partition-scoped layout (backups inside it). */
  private[streaming] def recoverSnapshots(
      fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Unit = {
    val sideBackup =
      new org.apache.hadoop.fs.Path(base.getParent, BackupPrefix + base.getName)
    if (fs.exists(sideBackup)) {
      if (!fs.exists(base)) fs.rename(sideBackup, base)
      else fs.delete(sideBackup, true)
    }
    if (fs.exists(base)) fs.listStatus(base).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(BackupPrefix)) {
        val live = new org.apache.hadoop.fs.Path(base, n.stripPrefix(BackupPrefix))
        if (!fs.exists(live)) fs.rename(st.getPath, live)
        else fs.delete(st.getPath, true)
      }
    }
  }

  /** Rename `live` aside, move `staged` in, then drop the backup — the
    * live data is never deleted before its replacement is in place.
    * Every rename's boolean result is checked: Hadoop `FileSystem`
    * reports many failures as `false`, not exceptions, and proceeding
    * past a failed `staged → live` to the backup delete would destroy
    * the only surviving copy. On failure the backup is left in place
    * for [[recoverSnapshots]] to restore. */
  private def swapIn(
      fs: org.apache.hadoop.fs.FileSystem,
      staged: org.apache.hadoop.fs.Path,
      live: org.apache.hadoop.fs.Path,
      backup: org.apache.hadoop.fs.Path): Unit = {
    if (fs.exists(backup)) fs.delete(backup, true)
    if (fs.exists(live) && !fs.rename(live, backup))
      throw new java.io.IOException(
        s"swapIn: rename $live -> $backup failed; table untouched")
    if (!fs.rename(staged, live))
      throw new java.io.IOException(
        s"swapIn: rename $staged -> $live failed; backup kept at $backup " +
          "for recoverSnapshots")
    fs.delete(backup, true)
  }

  /** Cast/reorder a read-back base to the change set's schema (partition
    * column type inference on read-back may e.g. turn a string day into
    * a date; the merge needs both struct sides identical). Columns the
    * base lacks backfill NULL — add-column schema evolution; columns
    * the change stream dropped disappear. */
  private def alignTo(df: DataFrame, schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(schema.fields.toSeq.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  private def hasParquetData(
      fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(base) && fs.listStatus(base).exists { st =>
      val n = st.getPath.getName
      !n.startsWith(".") && !n.startsWith("_")
    }

  /** Whole-snapshot merge: read the full base, merge, stage, swap. */
  private def fullSnapshotUpsert(
      sp: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path,
      changes: DataFrame,
      key: String,
      batchId: Long): Unit = {
    val baseDf =
      if (hasParquetData(fs, base))
        alignTo(sp.read.option("mergeSchema", "true").parquet(base.toString),
          changes.schema)
      else changes.limit(0)
    val merged = graft.operators.MergeUpsert(baseDf, changes, key).drop("merge_action")
    val staging = new org.apache.hadoop.fs.Path(
      base.getParent, s".staging-${base.getName}-$batchId")
    merged.write.mode("overwrite").parquet(staging.toString)
    swapIn(fs, staging, base,
      new org.apache.hadoop.fs.Path(base.getParent, BackupPrefix + base.getName))
  }

  /** Partition-scoped merge: read ONLY the partitions the change keys
    * touch (partition pruning on `pc`), merge, stage partitioned, and
    * swap each staged partition dir in individually. Untouched
    * partitions are neither read nor written. */
  private def partitionScopedUpsert(
      sp: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path,
      changes: DataFrame,
      key: String,
      pc: String,
      batchId: Long): Unit = {
    // the distinct partition values of one micro-batch: a handful of
    // scalars (typically 1–2 days), legitimately driver-side
    val affected = changes.select(col(pc)).distinct().collect().map(_.get(0))
    val baseDf =
      if (hasParquetData(fs, base))
        alignTo(
          sp.read.option("mergeSchema", "true").parquet(base.toString)
            .filter(col(pc).isin(affected.toSeq: _*)),
          changes.schema)
      else changes.limit(0)
    val merged = graft.operators.MergeUpsert(baseDf, changes, key).drop("merge_action")
    val staging = new org.apache.hadoop.fs.Path(
      base.getParent, s".staging-${base.getName}-$batchId")
    merged.write.mode("overwrite").partitionBy(pc).parquet(staging.toString)
    fs.mkdirs(base)
    fs.listStatus(staging).foreach { st =>
      val n = st.getPath.getName
      if (n.contains("=")) // partition dirs only; skip _SUCCESS
        swapIn(fs, st.getPath, new org.apache.hadoop.fs.Path(base, n),
          new org.apache.hadoop.fs.Path(base, BackupPrefix + n))
    }
    fs.delete(staging, true)
  }

  /** Run any streaming transform of the events table to completion over
    * existing files (Trigger.AvailableNow semantics via
    * processAllAvailable) into an in-memory sink; returns the result. */
  def runToMemory(
      spark: SparkSession,
      streamed: DataFrame,
      queryName: String): DataFrame = {
    val q = streamed.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }
}
