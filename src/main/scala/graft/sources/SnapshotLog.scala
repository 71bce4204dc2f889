package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal commit-log table format — the Iceberg/Delta model at its
  * irreducible core, for the CDC-upsert sink whose directory-swap
  * variant ([[graft.streaming.EventStreams.streamingUpsert]]) is honest
  * only where directory rename is atomic (HDFS, local FS). Layout:
  *
  * {{{
  *   table/
  *     _log/v00000000001.txt     one manifest per committed version
  *     data/b<batch>v<ver>/p=<part>/part-*.parquet
  * }}}
  *
  * A manifest is the COMPLETE list of live data files, one
  * `partition\tfile` line each. Readers list `_log`, pick the highest
  * version, and read exactly the files it names: a reader never sees a
  * half-written table because data files are invisible until a manifest
  * references them, and a manifest becomes visible atomically — it is
  * written to a dot-temp name and renamed into place with
  * overwrite=false. On S3 the rename is a copy of a FEW KILOBYTES (not
  * the table), and the object becomes visible atomically; orphaned data
  * files from a crashed commit are simply never referenced ([[vacuum]]
  * reclaims them). Rename-refusal on an existing target doubles as
  * optimistic concurrency: a lost race surfaces as a failed commit, and
  * [[upsertBatch]] re-reads the new state and retries.
  *
  * Partition pruning happens at the MANIFEST, not the directory walk:
  * [[readPartitions]] selects file paths by their recorded partition
  * value before Spark ever lists anything — the Iceberg insight that
  * makes planning O(manifest) instead of O(objects listed). Each data
  * file holds exactly one partition's rows and carries the partition
  * column as a real column (no Hive dir-name reconstruction needed).
  *
  * Scale: a manifest line is ~100 bytes per file; a 100 TB table at
  * 1 GB files is ~10^5 lines — megabytes, read once per plan. Per
  * upsert batch the IO is O(changed partitions) for data plus O(table
  * files) for the manifest rewrite; production formats shard manifests
  * per partition-subtree to cut that tail, which changes bookkeeping,
  * not this model.
  *
  * Contract shared with the swap-based sink: `partCol` values must be
  * non-null and stable per key, and their canonical string form must
  * not contain tab or newline (they key the manifest lines). */
object SnapshotLog {

  final case class Manifest(version: Long, files: Map[String, Seq[String]]) {
    def allFiles: Seq[String] = files.values.flatten.toSeq.sorted
  }

  /** Last line of every committed manifest. A manifest missing it is
    * in-flight (create-exclusive claimed the name but the writer has
    * not finished, or crashed mid-write) — readers skip it and fall
    * back to the previous complete version; writers allocate PAST it. */
  private val Footer = "#eof"

  private def logDir(base: Path) = new Path(base, "_log")
  private def vName(v: Long) = f"v$v%011d.txt"

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest version NAME present (committed or in-flight), 0 when the
    * table does not exist yet. Writers allocate `currentVersion + 1` so
    * a crashed in-flight manifest never blocks the version chain;
    * readers use [[readManifest]], which skips incomplete manifests. */
  def currentVersion(fs: FileSystem, base: Path): Long = {
    val dir = logDir(base)
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(n => n.stripPrefix("v").stripSuffix(".txt").toLong)
      .foldLeft(0L)(math.max)
  }

  /** The manifest of the newest COMPLETE version, if any — scans down
    * past in-flight/crashed manifests (missing [[Footer]]), which were
    * never visible as commits. */
  def readManifest(fs: FileSystem, base: Path): Option[Manifest] = {
    var v = currentVersion(fs, base)
    while (v > 0L) {
      readManifestAt(fs, base, v) match {
        case some @ Some(_) => return some
        case None => v -= 1
      }
    }
    None
  }

  /** The manifest of a specific committed version (time travel: every
    * manifest is immutable once committed and [[vacuum]] keeps every
    * committed version's files, so any historical snapshot remains
    * readable until its manifest is explicitly expired). */
  def readManifestAt(fs: FileSystem, base: Path, v: Long): Option[Manifest] = {
    val target = new Path(logDir(base), vName(v))
    if (v == 0L || !fs.exists(target)) None
    else {
      val in = fs.open(target)
      val text =
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      // a manifest is committed only once its footer is on disk; a
      // partially-written one (create-exclusive claimed, writer died)
      // reads as absent
      if (!text.endsWith(Footer + "\n")) None
      else {
        val files = text.split("\n").iterator
          .filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
            val Array(part, file) = line.split("\t", 2)
            part -> file
          }.toSeq.groupBy(_._1).map { case (p, fs0) => p -> fs0.map(_._2) }
        Some(Manifest(v, files))
      }
    }
  }

  /** Time-travel read: the table exactly as of committed version `v`. */
  def readVersion(spark: SparkSession, base: String, v: Long): Option[DataFrame] = {
    val bp = new Path(base)
    readManifestAt(fsFor(spark, bp), bp, v).map { m =>
      val files = m.allFiles.map(f => new Path(bp, f).toString)
      spark.read.option("mergeSchema", "true").parquet(files: _*)
    }
  }

  /** Atomically publish `m` as version `m.version` by CREATE-EXCLUSIVE
    * on the final name. Returns false when that version already exists —
    * the optimistic-concurrency conflict signal.
    *
    * Why not temp-write + rename: Hadoop's `RawLocalFileSystem.rename`
    * delegates to POSIX rename, which silently REPLACES an existing
    * target, so two same-version committers could both "succeed" with
    * one manifest clobbering the other. An exclusive create is atomic
    * where it matters: O_EXCL via NIO on the local FS, the namenode's
    * atomic create on HDFS, conditional PUT (If-None-Match) on modern
    * object stores. The claimed file only becomes a COMMIT once its
    * [[Footer]] line is written — readers treat a footer-less manifest
    * as absent, so the claim-then-write gap is invisible. */
  def tryCommit(fs: FileSystem, base: Path, m: Manifest): Boolean = {
    val dir = logDir(base)
    fs.mkdirs(dir)
    val target = new Path(dir, vName(m.version))
    if (fs.exists(target)) return false
    val text = m.files.toSeq.sortBy(_._1).flatMap { case (p, fls) =>
      fls.sorted.map(f => s"$p\t$f")
    }.mkString("", "\n", "\n") + Footer + "\n"
    val out: java.io.OutputStream =
      try {
        if (fs.getUri.getScheme == "file") {
          // Hadoop local create(overwrite=false) is check-then-act;
          // NIO CREATE_NEW is a single O_CREAT|O_EXCL syscall
          java.nio.file.Files.newOutputStream(
            java.nio.file.Paths.get(fs.makeQualified(target).toUri.getPath),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
        } else fs.create(target, false)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => return false
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false
      }
    try out.write(text.getBytes(StandardCharsets.UTF_8)) finally out.close()
    true
  }

  /** Read the current snapshot (empty table → empty result needs a
    * schema, so callers with no committed version must handle None).
    * `mergeSchema` because partitions evolve independently: a batch
    * that added a column rewrote only ITS partitions' files — older
    * partitions backfill the new column with NULL at read. */
  def read(spark: SparkSession, base: String): Option[DataFrame] = {
    val bp = new Path(base)
    readManifest(fsFor(spark, bp), bp).map { m =>
      val files = m.allFiles.map(f => new Path(bp, f).toString)
      spark.read.option("mergeSchema", "true").parquet(files: _*)
    }
  }

  /** Manifest-pruned read: only the files of the named partitions are
    * ever handed to Spark. */
  def readPartitions(
      spark: SparkSession, base: String, parts: Seq[String]): Option[DataFrame] = {
    val bp = new Path(base)
    readManifest(fsFor(spark, bp), bp).map { m =>
      val files = parts.flatMap(p => m.files.getOrElse(p, Nil))
        .map(f => new Path(bp, f).toString)
      if (files.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true").parquet(files: _*))
    }.flatten
  }

  /** MERGE a change batch into the table on `key` (latest `orderCol`
    * wins within the batch), rewriting ONLY the partitions the change
    * keys touch, then committing a new manifest. Safe to replay: the
    * merge is idempotent per key and a lost commit race re-reads and
    * retries against the winner's state. */
  def upsertBatch(
      spark: SparkSession,
      base: String,
      changes0: DataFrame,
      key: String,
      orderCol: String,
      partCol: String,
      batchId: Long,
      maxRetries: Int = 5): Unit = {
    val bp = new Path(base)
    val fs = fsFor(spark, bp)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(desc(orderCol))
    val changes = changes0
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .persist()
    val affected = changes.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted

    var attempt = 0
    var committed = false
    while (!committed && attempt < maxRetries) {
      val m = readManifest(fs, bp).getOrElse(Manifest(0L, Map.empty))
      // allocate past any in-flight/crashed claim, not just past the
      // newest COMPLETE manifest, or a dead claim blocks the chain
      val version = math.max(m.version, currentVersion(fs, bp)) + 1
      val baseSubset = {
        val files = affected.flatMap(p => m.files.getOrElse(p, Nil))
          .map(f => new Path(bp, f).toString)
        if (files.isEmpty) changes.limit(0)
        else {
          // align to the change batch's schema: columns the old files
          // lack backfill NULL (add-column evolution), columns the batch
          // dropped disappear (the change stream defines the live schema)
          val df = spark.read.option("mergeSchema", "true").parquet(files.toSeq: _*)
          val have = df.columns.toSet
          df.select(changes.schema.fields.toSeq.map { f =>
            if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
            else lit(null).cast(f.dataType).as(f.name)
          }: _*)
        }
      }
      val merged = graft.operators.MergeUpsert(baseSubset, changes, key)
        .drop("merge_action").persist()
      // one self-describing dir per affected partition (each file holds
      // exactly one partition's rows; the partition column stays a real
      // column, so no Hive dir-name reconstruction on read)
      // unique per attempt: a concurrent writer that happened to pick the
      // same (batchId, version) must never overwrite a dir the race
      // winner committed — the loser's orphan dir is vacuum's job
      val tok = java.util.UUID.randomUUID.toString.take(8)
      val newFiles = affected.zipWithIndex.flatMap { case (p, i) =>
        // dir name indexes the partition rather than embedding its value
        // (values may contain path-hostile characters; the manifest line
        // and the in-file column are the durable mapping)
        val rel = s"data/b${batchId}v$version-$tok/p$i"
        val dir = new Path(bp, rel)
        merged.filter(col(partCol).cast("string") === p)
          .write.mode("overwrite").parquet(dir.toString)
        fs.listStatus(dir).map(_.getPath.getName)
          .filter(_.endsWith(".parquet"))
          .map(n => p -> s"$rel/$n")
      }
      merged.unpersist()
      val next = Manifest(version,
        (m.files -- affected) ++ newFiles.groupBy(_._1).map {
          case (p, fls) => p -> fls.map(_._2).toSeq
        })
      committed = tryCommit(fs, bp, next)
      attempt += 1
    }
    changes.unpersist()
    if (!committed) throw new IllegalStateException(
      s"SnapshotLog commit lost $maxRetries races on $base — raise maxRetries")
  }

  /** Compact one partition's files into a single rewrite and commit the
    * result as a new version — the maintenance pass every CDC sink
    * needs (each upsert batch adds files; unchecked, read planning and
    * open-file overhead grow per batch). Pure metadata semantics: the
    * table's CONTENT is unchanged (spec-proven), only its file layout
    * shrinks; old versions still time-travel to the pre-compaction
    * layout. Returns the new version, or 0 if the partition has ≤1
    * file (nothing to do). Runs through the same optimistic commit, so
    * a concurrent upsert either wins (compaction retries against its
    * state) or loses cleanly. */
  def compactPartition(
      spark: SparkSession,
      base: String,
      part: String,
      maxRetries: Int = 5): Long = {
    val bp = new Path(base)
    val fs = fsFor(spark, bp)
    var attempt = 0
    while (attempt < maxRetries) {
      val m = readManifest(fs, bp).getOrElse(return 0L)
      val files = m.files.getOrElse(part, Nil)
      if (files.size <= 1) return 0L
      val version = math.max(m.version, currentVersion(fs, bp)) + 1
      // staging dir unique per attempt AND partition: two concurrent
      // compactions reading the same manifest compute the same target
      // version — keyed only by version they would overwrite each
      // other's staged (possibly already-committed) files
      val rel =
        s"data/c$version-a$attempt-${java.util.UUID.randomUUID.toString.take(8)}"
      val dir = new Path(bp, rel)
      spark.read.parquet(files.map(f => new Path(bp, f).toString): _*)
        .repartition(1)
        .write.mode("overwrite").parquet(dir.toString)
      val newFiles = fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.endsWith(".parquet")).map(n => s"$rel/$n").toSeq
      if (tryCommit(fs, bp, Manifest(version, m.files.updated(part, newFiles))))
        return version
      attempt += 1
    }
    throw new IllegalStateException(
      s"compaction lost $maxRetries commit races on $base/$part")
  }

  /** Delete data files no manifest version references (crashed commits
    * leave them; they were never visible). Keeps all committed
    * manifests' files, so time-travel reads of old versions survive.
    *
    * `retentionMs` guards concurrent writers: an in-flight
    * `upsertBatch`/`compactPartition` has written its data files but
    * not yet committed the manifest that references them — deleting
    * those would make the imminent commit point at nothing. Only
    * unreferenced files whose modification time is older than
    * `retentionMs` are reclaimed; set it to comfortably exceed the
    * longest possible write job (the 24h default is the
    * Delta/Iceberg convention). `retentionMs = 0` reclaims
    * everything unreferenced and is safe ONLY with no concurrent
    * writers (tests, single-writer maintenance windows). */
  def vacuum(
      spark: SparkSession,
      base: String,
      retentionMs: Long = 24L * 3600 * 1000): Long = {
    val bp = new Path(base)
    val fs = fsFor(spark, bp)
    val dir = logDir(bp)
    if (!fs.exists(dir)) return 0L
    val referenced = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(n => n.stripPrefix("v").stripSuffix(".txt").toLong)
      .flatMap { v =>
        val in = fs.open(new Path(dir, vName(v)))
        val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
        // keep even an INCOMPLETE manifest's file references: its
        // writer may still be alive and about to finish the commit
        text.split("\n").filter(l => l.nonEmpty && !l.startsWith("#"))
          .map(_.split("\t", 2)(1))
      }.toSet
    val dataDir = new Path(bp, "data")
    if (!fs.exists(dataDir)) return 0L
    var removed = 0L
    val cutoff = System.currentTimeMillis() - retentionMs
    // listFiles returns scheme-qualified paths; relativize against the
    // equally-qualified base or the prefix strip silently no-ops
    val qBase = fs.makeQualified(bp).toString
    val it = fs.listFiles(dataDir, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile) {
        val rel = st.getPath.toString.stripPrefix(qBase).stripPrefix("/")
        if (rel.endsWith(".parquet") && !referenced.contains(rel) &&
            st.getModificationTime <= cutoff) {
          fs.delete(st.getPath, false)
          removed += 1
        }
      }
    }
    removed
  }
}
