package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** JSON source/sink round-trip with an explicit schema (the S-family
  * coverage beyond CSV/parquet: same reader contract, different format). */
class JsonSourceSpec extends SparkSpec {

  test("events round-trip through JSON lines with explicit schema") {
    val dir = Files.createTempDirectory("graft_json").toString
    val events = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    // default timestampFormat keeps only milliseconds; spell out µs
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    events.write.mode("overwrite").option("timestampFormat", tsFmt).json(dir)

    val back = spark.read
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("timestampFormat", tsFmt)
      .json(dir)

    assert(back.count() == events.count())
    val a = events.agg(sum(col("value")).cast("decimal(38,6)")).collect()(0).getDecimal(0)
    val b = back.agg(sum(col("value")).cast("decimal(38,6)")).collect()(0).getDecimal(0)
    assert(a == b, "value column must survive the JSON round-trip")
    // timestamps keep microsecond precision through ISO-8601 text
    assert(back.join(events, Seq("event_id"))
      .filter(events("ts") =!= back("ts")).count() == 0)
  }

  test("corrupt JSON lines are isolated, not fatal (PERMISSIVE mode)") {
    val dir = Files.createTempDirectory("graft_json_bad").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      """{"event_id": 1, "event_type": "ok"}
        |this is not json
        |{"event_id": 2, "event_type": "ok"}
        |""".stripMargin.getBytes)
    // Spark refuses to filter on _corrupt_record straight off the raw
    // files; the documented pattern is to cache the parsed frame first
    val df = spark.read
      .schema("event_id BIGINT, event_type STRING, _corrupt_record STRING")
      .json(dir)
      .cache()
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
  }
}
