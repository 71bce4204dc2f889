package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Schema evolution across incremental batches — the property the
  * reference delegates to its Glue crawler's `UPDATE_IN_DATABASE`
  * policy (`infrastructure/main.tf:170-173`): later batches may add
  * columns, and a unified read must surface them with NULLs for the
  * older batches. */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema unifies batches when a later batch adds a column") {
    val dir = Files.createTempDirectory("graft_evolve").toString
    val events = Tables(spark, sfDir, "events")
      .select("event_id", "user_id", "value")

    events.limit(100).write.mode("overwrite").parquet(s"$dir/batch=1")
    events.limit(50)
      .withColumn("quality_score", col("value") * 2)
      .write.mode("overwrite").parquet(s"$dir/batch=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet ==
      Set("event_id", "user_id", "value", "quality_score", "batch"))
    assert(merged.count() == 150)
    // old batch surfaces NULL for the new column; new batch carries it
    assert(merged.filter(col("batch") === 1 && col("quality_score").isNotNull).count() == 0)
    assert(merged.filter(col("batch") === 2 && col("quality_score").isNull).count() == 0)
  }

  test("explicit schema read is immune to column additions (stable contract)") {
    val dir = Files.createTempDirectory("graft_evolve2").toString
    val events = Tables(spark, sfDir, "events").select("event_id", "value")
    events.limit(10).write.mode("overwrite").parquet(s"$dir/b1")
    events.limit(10).withColumn("extra", lit(1))
      .write.mode("overwrite").parquet(s"$dir/b2")

    val fixed = spark.read
      .schema("event_id BIGINT, value DOUBLE")
      .parquet(s"$dir/b1", s"$dir/b2")
    assert(fixed.columns.toSeq == Seq("event_id", "value"))
    assert(fixed.count() == 20)
  }

  test("ALTER COLUMN TYPE: metadata-only widening, upcast reads, refusals") {
    import org.apache.spark.sql.types._
    val s = graft.GraftSessions.withExtensions(spark)
    import s.implicits._
    val base = Files.createTempDirectory("graft_widen").toString + "/tbl"
    val rows = (1 to 100).map(i =>
        (i.toLong, i, i.toFloat / 4, BigDecimal(i).setScale(2), "d0"))
      .toDF("id", "v", "f", "dd", "day")
      .select(col("id"), col("v").cast(IntegerType).as("v"),
        col("f").cast(FloatType).as("f"),
        col("dd").cast(DecimalType(5, 2)).as("dd"), col("day"))
    SnapshotLog.upsertBatch(s, base, rows, Seq("id"), "id", "day",
      batchId = 1L, maxRetries = 5, statsCols = Seq("v", "f"),
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    val view = Catalog.registerSnapshotLog(s, "widen", "t1", base, Some("day"))
    val bp = new org.apache.hadoop.fs.Path(base)
    val fs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val v0 = SnapshotLog.readManifest(fs, bp).get.version

    s.sql(s"ALTER TABLE $view ALTER COLUMN v TYPE BIGINT")
    s.sql(s"ALTER TABLE $view ALTER COLUMN f TYPE DOUBLE")
    s.sql(s"ALTER TABLE $view ALTER COLUMN dd TYPE DECIMAL(12,2)")
    val m = SnapshotLog.readManifest(fs, bp).get
    val sc = m.schema.get
    assert(sc("v").dataType == LongType)
    assert(sc("f").dataType == DoubleType)
    assert(sc("dd").dataType == DecimalType(12, 2))
    // old int32/float/decimal(5,2) files upcast on read — values exact
    val t = s.table(view)
    assert(t.schema("v").dataType == LongType)
    assert(t.agg(sum(col("v"))).head.getLong(0) == 5050L)
    assert(t.filter(col("f") === 12.5d).count() == 1) // 50/4 exact in both
    assert(t.agg(max(col("dd"))).head.getDecimal(0)
      == new java.math.BigDecimal("100.00"))
    // stats hygiene: integral bounds kept, float bounds dropped
    val stats = m.files("d0").flatMap(f => m.stats.getOrElse(f, Map.empty).keys)
    assert(stats.contains("v"), "int->long keeps bounds")
    assert(!stats.contains("f"), "float->double must drop stale bounds")
    // the next write lands wide values beyond Int range
    val wide = Seq((1000L, 5000000000L, 1.5d, BigDecimal("9999999999.99"), "d0"))
      .toDF("id", "v", "f", "dd", "day")
      .select(col("id"), col("v"), col("f"),
        col("dd").cast(DecimalType(12, 2)).as("dd"), col("day"))
    SnapshotLog.upsertBatch(s, base, wide, Seq("id"), "id", "day",
      batchId = 2L, maxRetries = 5, statsCols = Nil,
      clusterBy = Nil, clusterFiles = 2, opCol = None, writeCdf = false)
    // API-level write: read back through the log (the registered view
    // pins its snapshot until the next SQL DML/DDL repins it)
    assert(SnapshotLog.read(s, base).get.agg(max(col("v"))).head.getLong(0)
      == 5000000000L)
    // time travel to the pre-widen version answers with the old types
    assert(SnapshotLog.readVersion(s, base, v0).get.schema("v").dataType
      == IntegerType)
    // refusals: narrowing, and the partition column
    val e1 = intercept[Exception](
      s.sql(s"ALTER TABLE $view ALTER COLUMN id TYPE INT"))
    assert(e1.getMessage.contains("widening"), e1.getMessage)
    val e2 = intercept[Exception](
      s.sql(s"ALTER TABLE $view ALTER COLUMN day TYPE VARCHAR(10)"))
    assert(e2.getMessage.contains("widening") ||
      e2.getMessage.contains("partition"), e2.getMessage)
  }
}
