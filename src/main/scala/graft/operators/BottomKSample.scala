package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic per-key reservoir sampling as a typed Aggregator —
  * "bottom-k by hash priority" (a.k.a. bottom-k sketch / consistent
  * sampling).
  *
  * Training-data pipelines need per-key samples constantly (per-domain,
  * per-language, per-source caps). A window `row_number() <= k` gives the
  * semantics but ranks by sort; this Aggregator keeps a bounded k-element
  * heap per group per partition (map-side partial aggregation!), merges
  * heaps associatively, and never sorts more than k elements per group.
  * Memory is O(k) per group regardless of group size — the property that
  * matters when one domain has 10^10 documents.
  *
  * Determinism: priority is supplied by the caller as a pure function of
  * the row (e.g. `graft_rolling_hash(id || ':' || seed)`), so the sample
  * is stable across partitionings, retries, and engines — any system that
  * can compute the same hash draws the same sample (the DuckDB oracle
  * does; see q32).
  */
final case class Prioritized(priority: Long, payload: String)

class BottomKSample(k: Int)
    extends Aggregator[Prioritized, mutable.ArrayBuffer[Prioritized], Seq[Prioritized]] {

  private val ord: Ordering[Prioritized] =
    Ordering.by(p => (p.priority, p.payload))

  override def zero: mutable.ArrayBuffer[Prioritized] = mutable.ArrayBuffer.empty

  /** Keep the k smallest (priority, payload) — the buffer stays ≤ k by
    * dropping the current maximum once full. */
  override def reduce(
      buf: mutable.ArrayBuffer[Prioritized], in: Prioritized): mutable.ArrayBuffer[Prioritized] = {
    buf += in
    shrink(buf)
  }

  override def merge(
      a: mutable.ArrayBuffer[Prioritized],
      b: mutable.ArrayBuffer[Prioritized]): mutable.ArrayBuffer[Prioritized] =
    shrink(a ++= b)

  private def shrink(buf: mutable.ArrayBuffer[Prioritized]): mutable.ArrayBuffer[Prioritized] =
    if (buf.length <= k) buf
    else {
      val kept = buf.sorted(ord).take(k)
      buf.clear()
      buf ++= kept
    }

  override def finish(buf: mutable.ArrayBuffer[Prioritized]): Seq[Prioritized] =
    buf.sorted(ord).take(k).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[Prioritized]] =
    Encoders.kryo[mutable.ArrayBuffer[Prioritized]]

  override def outputEncoder: Encoder[Seq[Prioritized]] =
    ExpressionEncoder[Seq[Prioritized]]()
}
