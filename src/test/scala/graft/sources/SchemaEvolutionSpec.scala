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
}
