package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Secondary source formats beyond CSV/JSON/parquet (SURVEY §2.1's
  * "other formats the engine should read"): ORC with pushdown, the
  * line-oriented text source, and whole-file binary ingestion (the
  * multimodal loading path for real media files on disk). */
class SourceFormatsSpec extends SparkSpec {

  test("ORC round-trip preserves data and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/events"
    val events = Tables(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
    events.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == events.count())
    assert(back.except(events).isEmpty && events.except(back).isEmpty)
    // predicate pushdown reaches the ORC scan like parquet
    val plan = back.filter(col("user_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replace(" ", "").contains("EqualTo(user_id,7)"),
      s"ORC scan must carry the pushed filter:\n$plan")
  }

  test("text source reads lines; binaryFile ingests whole files with metadata") {
    val dir = Files.createTempDirectory("graft_textsrc").toString
    import spark.implicits._
    val lines = (1 to 100).map(i => s"line-$i")
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(s"$dir/txt")
    val back = spark.read.text(s"$dir/txt").as[String].collect().toSet
    assert(back == lines.toSet)

    // binaryFile: the on-disk loading path for the multimodal media
    // columns (m-series synthesize in-engine; real corpora land as files)
    val bin = spark.read.format("binaryFile").load(s"$dir/txt")
    val row = bin.select("path", "length", "content").collect().head
    assert(row.getLong(1) > 0 && row.getAs[Array[Byte]](2).nonEmpty)
    assert(new String(row.getAs[Array[Byte]](2), "UTF-8").contains("line-1"))
  }
}
