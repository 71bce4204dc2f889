package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE (upsert) semantics as a batch operator: apply a change set to a
  * base table on a unique key — matched rows are replaced by the change
  * row, unmatched change rows are inserted, untouched base rows pass
  * through. The incremental-refresh primitive the reference approximates
  * with full-overwrite reloads (`sql/ddl_staging.sql:40-43` TRUNCATE+COPY;
  * our engine gives the row-level form).
  *
  * Each side is packed into ONE struct before the full-outer join and the
  * winning row is picked whole — per-column `coalesce` would silently mix
  * rows when a change row carries a genuine NULL (same failure mode as
  * the as-of join payload, see [[AsOfJoin]]); the struct pick preserves
  * intentional NULL updates. Row presence on either side of the outer
  * join is tested on the packed struct itself (non-null iff the row
  * exists, even when every field inside is NULL), so the NULL-safety
  * does not depend on any key column being non-null.
  *
  * Keys may be composite (`Seq[String]` — the CDC norm is a multi-column
  * business key); the join is a conjunction of per-column equalities, so
  * Catalyst still plans a single hash-partitioned equi-join.
  *
  * Scale: one shuffle (hash partition both sides on the key), streaming
  * full-outer merge join or hash join per Catalyst's choice; no driver
  * collection, no row multiplication. For repeated merges at 100 TB,
  * bucket the base table on the key so only the (small) change set
  * shuffles per batch.
  *
  * Precondition: the key tuple is unique on both sides (dedupe the
  * change set with a latest-wins window first if it isn't).
  */
object MergeUpsert {

  /** @return base.columns plus `merge_action` ∈ {update, insert, keep} */
  def apply(base: DataFrame, changes: DataFrame, key: String): DataFrame =
    apply(base, changes, Seq(key))

  /** Composite-key MERGE: same contract, key = the column tuple. */
  def apply(base: DataFrame, changes: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "MergeUpsert needs at least one key column")
    val cols = base.columns.toSeq
    val b = base.select(
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"__bk$i") } :+
        struct(cols.map(col): _*).as("__b"): _*)
    val c = changes.select(
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"__ck$i") } :+
        struct(cols.map(col): _*).as("__c"): _*)
    val picked = when(col("__c").isNotNull, col("__c")).otherwise(col("__b"))
    b.join(c, joinCond(keys), "full_outer")
      .select(
        cols.map(n => picked.getField(n).as(n)) :+
          when(col("__c").isNotNull && col("__b").isNotNull, "update")
            .when(col("__b").isNull, "insert")
            .otherwise("keep").as("merge_action"): _*)
  }

  /** Full CDC apply — [[apply]] plus deletes, the complete change-stream
    * contract (Debezium-style): `changes` carries `opCol` ∈ {U, D}; a
    * D row removes its key from the result (a D for an absent key is a
    * no-op, which at-least-once replay requires), any other op replaces
    * or inserts the row wholesale. Same one-shuffle full-outer
    * struct-pick shape; the delete is a post-join filter, not a second
    * pass. Precondition as [[apply]]: unique keys per side (latest-wins
    * dedup upstream resolves a delete-then-reinsert within one batch).
    *
    * @return base.columns plus `merge_action` ∈ {update, insert, keep}
    *         (deleted keys simply do not appear) */
  def cdc(base: DataFrame, changes: DataFrame, key: String, opCol: String): DataFrame =
    cdc(base, changes, Seq(key), opCol)

  /** Composite-key CDC apply. */
  def cdc(base: DataFrame, changes: DataFrame, keys: Seq[String], opCol: String): DataFrame = {
    require(keys.nonEmpty, "MergeUpsert.cdc needs at least one key column")
    val cols = base.columns.toSeq
    val b = base.select(
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"__bk$i") } :+
        struct(cols.map(col): _*).as("__b"): _*)
    val c = changes.select(
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"__ck$i") } :+
        col(opCol).as("__op") :+
        struct(cols.map(col): _*).as("__c"): _*)
    val picked = when(col("__c").isNotNull, col("__c")).otherwise(col("__b"))
    // null-safe op compare: a NULL op (out of the documented {U, D}
    // contract) must degrade to upsert, not make the predicate NULL and
    // silently drop the row
    b.join(c, joinCond(keys), "full_outer")
      .filter(!(col("__c").isNotNull && (col("__op") <=> lit("D"))))
      .select(
        cols.map(n => picked.getField(n).as(n)) :+
          when(col("__c").isNotNull && col("__b").isNotNull, "update")
            .when(col("__b").isNull, "insert")
            .otherwise("keep").as("merge_action"): _*)
  }

  private def joinCond(keys: Seq[String]): Column =
    keys.indices.map(i => col(s"__bk$i") === col(s"__ck$i")).reduce(_ && _)
}
