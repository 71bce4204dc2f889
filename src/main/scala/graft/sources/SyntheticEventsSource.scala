package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2: a deterministic synthetic event generator with
  * REAL pushdown — the engine-extension seam a 100 TB pipeline uses for
  * non-file inputs (feature stores, id-range services, backfill
  * generators).
  *
  * What pushes down, and where it takes effect:
  *   - **Column pruning** (`SupportsPushDownRequiredColumns`): readers
  *     materialize only requested fields — `ReadSchema` in
  *     `.explain("formatted")` shows the pruned struct.
  *   - **id-range filters** (`SupportsPushDownFilters`): `=, <, <=, >, >=`
  *     on `id` are absorbed into the scan (they appear as `PushedFilters`
  *     and are REMOVED from the post-scan filter), and — the part that
  *     matters at scale — partition PLANNING prunes: an InputPartition
  *     whose id range cannot intersect the residual bound is never
  *     created, so a selective query schedules 1 task instead of N
  *     (`rdd.getNumPartitions` proves it in SyntheticSourceSpec).
  *
  * Rows are a pure function of `id` (splitmix64 bit-mix), so the source
  * is deterministic across runs/partitionings — the same contract the
  * parquet corpus gives the oracle queries.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.SyntheticEventsSource")
  *   .option("rows", 100000).option("partitions", 32).load()
  * }}}
  */
class SyntheticEventsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEventsSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt)
}

object SyntheticEventsSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** splitmix64 finalizer — deterministic per-id attribute derivation. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val epochUs = 1700000000000000L // fixed base instant (µs)

  /** Row attributes as pure functions of id. */
  def tsOf(id: Long): Long = epochUs + id * 1000000L
  def userOf(id: Long): Long = math.floorMod(mix(id), 1000L)
  def valueOf(id: Long): Double = math.floorMod(mix(id * 31), 100000L) / 100.0
}

private class SyntheticTable(rows: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SyntheticEventsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, partitions)
}

private class SyntheticScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 0L // inclusive id lower bound
  private var hi = rows // exclusive id upper bound
  private var pushed = Array.empty[Filter]
  private var required: StructType = SyntheticEventsSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("id", _: Long) | GreaterThan("id", _: Long) |
          GreaterThanOrEqual("id", _: Long) | LessThan("id", _: Long) |
          LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    // `v + 1` overflows at Long.MaxValue (wraps negative) — saturate:
    // `id <= MaxValue` is vacuously true (hi unchanged); `id > MaxValue`
    // matches nothing (lo = MaxValue empties [lo, hi) since hi <= rows);
    // `id = MaxValue` needs only the lower bound (ids are < rows <= MaxValue).
    accepted.foreach {
      case EqualTo("id", v: Long) =>
        lo = lo.max(v); if (v != Long.MaxValue) hi = hi.min(v + 1)
      case GreaterThan("id", v: Long) =>
        if (v == Long.MaxValue) lo = Long.MaxValue else lo = lo.max(v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = lo.max(v)
      case LessThan("id", v: Long) => hi = hi.min(v)
      case LessThanOrEqual("id", v: Long) =>
        if (v != Long.MaxValue) hi = hi.min(v + 1)
      case _ => ()
    }
    pushed = accepted
    rejected // residual: Spark re-applies only these above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SyntheticScan(lo, hi, rows, partitions, required, pushed)
}

private class SyntheticScan(
    lo: Long, hi: Long, rows: Long, partitions: Int, required: StructType,
    pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // surfaces in explain output (BatchScanExec renders the description)
  override def description(): String =
    s"graft_synth PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"IdRange: [$lo, $hi), ReadSchema: ${required.simpleString}"

  /** Partition pruning at plan time: only ranges intersecting [lo, hi). */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0 until partitions).iterator
      .map(i => SyntheticRange(i * per, math.min((i + 1) * per, rows)))
      .map(r => SyntheticRange(r.start.max(lo), r.end.min(hi)))
      .filter(r => r.start < r.end)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)
}

private case class SyntheticRange(start: Long, end: Long) extends InputPartition

private class SyntheticReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[SyntheticRange]
    // column pruning: precompute one getter per REQUIRED field
    val getters: Array[Long => Any] = required.fields.map(_.name match {
      case "id" => (id: Long) => id
      case "ts" => SyntheticEventsSource.tsOf _
      case "user_id" => SyntheticEventsSource.userOf _
      case "value" => SyntheticEventsSource.valueOf _
    })
    new PartitionReader[InternalRow] {
      private var cur = r.start - 1
      override def next(): Boolean = { cur += 1; cur < r.end }
      override def get(): InternalRow =
        new GenericInternalRow(getters.map(g => g(cur)).asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
