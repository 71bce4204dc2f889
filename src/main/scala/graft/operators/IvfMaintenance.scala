package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.{SnapshotLog, SnapshotRelation}

/** Lifecycle of a PERSISTED IVF index (the s23 layout made
  * maintainable): the assignment lives as a cid-partitioned graft
  * table at `base`, the centroids as a sibling graft table at
  * `base + "_centroids"` — both versioned, both time-travelable.
  *
  *  - [[build]]: one-time pipeline step — Lloyd centroids, assign,
  *    commit.
  *  - [[append]]: incremental growth — assign a new batch against the
  *    FROZEN stored centroids and append into its cells (the corpus
  *    never rewrites).
  *  - [[recluster]]: the drift repair. Appends against frozen
  *    centroids skew cell balance and recall; RECLUSTER re-derives
  *    centroids from the CURRENT corpus (Lloyd iterations seeded by
  *    the stored set), re-assigns, and rewrites ONLY the touched
  *    cells through the proven replaceWhere machinery (a cell whose
  *    membership is unchanged keeps its exact file list). The two
  *    tables commit separately, so the pair is NOT atomic: a probe
  *    racing the recluster (or a crash between the commits) can see
  *    the NEW assignments under the OLD centroids — degraded probe
  *    recall, never wrong rows. The window is made detectable and
  *    repairable by a token handshake: the recluster stamps
  *    [[PendingProp]] on the index BEFORE rewriting, the centroid
  *    commit carries the matching [[TokenProp]], and the stamp is
  *    cleared only after both land. [[repairIfPending]] (run
  *    automatically at the start of every recluster, and callable by
  *    any operator) detects a dangling stamp and re-derives a
  *    CONSISTENT centroid set — each cell's exact member mean, the
  *    Lloyd M-step of the stored assignment — so a crashed recluster
  *    never leaves the degraded pairing permanent.
  *  - [[recallAtK]]: the quality gauge — mean recall@k of the
  *    persisted probe vs exact brute force over a query sample.
  *
  * Scale shape: every step is the broadcast-argmin assignment scan +
  * partition-scoped table writes; the corpus is never collected and
  * never globally shuffled (the replace routes by cid, the table's own
  * partitioning). IvfReclusterSpec grades drift → recluster → recall
  * end-to-end. */
object IvfMaintenance {

  def centroidsPath(base: String): String = base + "_centroids"

  /** Build the index at `base` from `vecs` (vec_id, v): k Lloyd
    * centroids (`iters` refinements from the deterministic seed set),
    * assignment committed cid-partitioned. */
  def build(spark: SparkSession, base: String, vecs: DataFrame,
      k: Int, iters: Int): Unit = {
    val cent = IvfIndex.centroids(vecs, k, iters)
    SnapshotLog.appendBatch(spark, base,
      IvfIndex.assign(vecs, cent).join(vecs, Seq("vec_id")),
      "cid", batchId = 1L,
      propsAdd = Map(SnapshotLog.PartColProp -> "cid"))
    SnapshotLog.appendBatch(spark, centroidsPath(base), cent,
      SnapshotLog.NoPartCol, batchId = 1L,
      propsAdd = Map(SnapshotLog.PartColProp -> SnapshotLog.NoPartCol))
  }

  private def readCentroids(spark: SparkSession, base: String): DataFrame =
    SnapshotRelation.read(spark, centroidsPath(base)).getOrElse(
      sys.error(s"$base has no centroid table — build() first"))

  private def readIndex(spark: SparkSession, base: String): DataFrame =
    SnapshotRelation.read(spark, base, partCol = Some("cid")).getOrElse(
      sys.error(s"$base has no committed index — build() first"))

  /** Incremental growth: assign `vecs` against the FROZEN stored
    * centroids, append into their cells. */
  def append(spark: SparkSession, base: String, vecs: DataFrame): Unit = {
    val cent = readCentroids(spark, base)
    SnapshotLog.appendBatch(spark, base,
      IvfIndex.assign(vecs, cent).join(vecs, Seq("vec_id")),
      "cid", batchId = SnapshotLog.committedVersions(
        new org.apache.hadoop.fs.Path(base).getFileSystem(
          spark.sparkContext.hadoopConfiguration),
        new org.apache.hadoop.fs.Path(base)).lastOption.getOrElse(0L) + 1L)
  }

  /** Index-table property naming the centroid-commit token the NEXT
    * centroid overwrite must carry — stamped before the index rewrite,
    * cleared after the centroid table lands. While it dangles, the
    * pair may be mixed (new assignments, old centroids). */
  val PendingProp = "graft.ivf.pendingCentroids"

  /** Centroid-table property carrying the token of the recluster (or
    * repair) that committed the current set. */
  val TokenProp = "graft.ivf.centroidToken"

  private def indexProps(spark: SparkSession, base: String): Map[String, String] = {
    val bp = new org.apache.hadoop.fs.Path(base)
    SnapshotLog.readManifest(
      bp.getFileSystem(spark.sparkContext.hadoopConfiguration), bp)
      .map(_.props).getOrElse(Map.empty)
  }

  /** True when the index carries a dangling [[PendingProp]] whose
    * token the centroid table does not carry — i.e. a recluster died
    * (or is racing) between its two commits and probes may pair new
    * assignments with old centroids. */
  def halfApplied(spark: SparkSession, base: String): Boolean =
    indexProps(spark, base).get(PendingProp).exists(tok =>
      !indexProps(spark, centroidsPath(base)).get(TokenProp).contains(tok))

  /** Detect-and-repair the half-applied window: when [[PendingProp]]
    * dangles, re-derive each cell's centroid as the EXACT member mean
    * of the stored assignment (the Lloyd M-step — consistent with the
    * assignment by construction), commit it with the pending token,
    * and clear the stamp. Returns true when a repair (or a stale-stamp
    * clear) was performed. Idempotent; safe to call any time. */
  def repairIfPending(spark: SparkSession, base: String): Boolean =
    indexProps(spark, base).get(PendingProp) match {
      case None => false
      case Some(tok) =>
        if (!indexProps(spark, centroidsPath(base)).get(TokenProp).contains(tok)) {
          val idx = readIndex(spark, base)
          val cent = idx
            .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
            .groupBy(col("cid"), col("pos"))
            .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 8)))
              .cast("double") / count(lit(1))).as("mu"))
            .groupBy(col("cid"))
            .agg(transform(
              sort_array(collect_list(struct(col("pos"), col("mu")))),
              _.getField("mu")).as("cv"))
          SnapshotLog.appendBatch(spark, centroidsPath(base), cent,
            SnapshotLog.NoPartCol, batchId = 0L, overwrite = true,
            resetColumnState = true,
            propsAdd = Map(TokenProp -> tok,
              SnapshotLog.PartColProp -> SnapshotLog.NoPartCol))
        }
        SnapshotLog.unsetProperties(spark, base, Seq(PendingProp))
        true
    }

  /** Re-derive centroids from the CURRENT corpus (Lloyd `iters` seeded
    * by the stored set), re-assign, rewrite only the TOUCHED cells.
    * Returns (moved rows, touched cells) — (0, 0) = the index was
    * already converged and nothing committed.
    *
    * Crash contract: the index rewrite and the centroid overwrite are
    * SEPARATE commits; between them (crash or concurrent probe) the
    * table pair is mixed — new assignments under old centroids, a
    * recall degradation, never wrong rows. The [[PendingProp]] stamp
    * makes that window detectable, and [[repairIfPending]] (also run
    * here, first) heals it deterministically. */
  def recluster(spark: SparkSession, base: String, iters: Int): (Long, Long) = {
    repairIfPending(spark, base)
    val idx = readIndex(spark, base)
    val vecs = idx.select(col("vec_id"), col("v"))
    val cent1 = IvfIndex.refine(vecs, readCentroids(spark, base), iters)
    val newAsg = IvfIndex.assign(vecs, cent1)
      .withColumnRenamed("cid", "new_cid")
    val moves = idx.select(col("vec_id"), col("cid").as("old_cid"))
      .join(newAsg, Seq("vec_id"))
      .filter(col("old_cid") =!= col("new_cid"))
      .persist()
    try {
      val movedRows = moves.count()
      if (movedRows == 0L) return (0L, 0L)
      // touched = every cell that gains OR loses membership — closed
      // by construction (each moved row contributes both its cells),
      // so the replace batch provably satisfies the predicate
      val touched = moves.select(col("old_cid").as("cid"))
        .union(moves.select(col("new_cid").as("cid")))
        .distinct().collect().map(_.getInt(0)).toSeq.sorted
      // the replace batch carries the index's FULL payload (any extra
      // columns beside vec_id/v/cid ride along), only cid reassigned
      val batch = idx.drop("cid")
        .join(newAsg.filter(col("new_cid").isin(touched: _*))
          .select(col("vec_id"), col("new_cid").as("cid")), Seq("vec_id"))
        .select(idx.columns.map(col): _*)
      // token handshake around the two commits (see the class doc):
      // stamp → rewrite index → commit centroids with token → clear
      val tok = java.util.UUID.randomUUID.toString
      SnapshotLog.setProperties(spark, base, Map(PendingProp -> tok))
      SnapshotLog.replaceWhere(spark, base, batch,
        col("cid").isin(touched: _*), "cid")
        .getOrElse(sys.error(s"$base lost its committed version mid-recluster"))
      SnapshotLog.appendBatch(spark, centroidsPath(base), cent1,
        SnapshotLog.NoPartCol, batchId = 0L, overwrite = true,
        resetColumnState = true,
        propsAdd = Map(TokenProp -> tok,
          SnapshotLog.PartColProp -> SnapshotLog.NoPartCol))
      SnapshotLog.unsetProperties(spark, base, Seq(PendingProp))
      (movedRows, touched.size.toLong)
    } finally { moves.unpersist(); () }
  }

  /** Mean recall@k of the persisted probe (partition-pruned cells via
    * the STORED centroids) vs exact brute-force cosine, over the
    * queries frame (qid, qv). */
  def recallAtK(spark: SparkSession, base: String, queries: DataFrame,
      nprobe: Int, k: Int): Double = {
    val idx = readIndex(spark, base)
    val cent = readCentroids(spark, base)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(desc("sim"), col("vec_id"))
    def topk(cand: DataFrame): DataFrame = cand
      .join(broadcast(queries), Seq("qid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        GraftFunctions.cosine(col("v"), col("qv")).as("sim"))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("qid"), col("vec_id"))
    val probed = topk(IvfIndex.probeBatch(queries, cent, nprobe)
      .join(idx, Seq("cid"))
      .select(col("qid"), col("vec_id"), col("v")))
    val exact = topk(idx.select(col("vec_id"), col("v"))
      .crossJoin(broadcast(queries.select(col("qid")))))
    val nq = queries.count().toDouble
    val hits = probed.join(exact, Seq("qid", "vec_id")).count().toDouble
    hits / (nq * k)
  }
}
