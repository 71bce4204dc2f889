package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class ClusteringSpec extends SparkSpec {

  test("range-clustered write produces files with disjoint key ranges") {
    val dir = Files.createTempDirectory("graft_cluster").toString + "/byuser"
    val events = Tables(spark, sfDir, "events")
      .select("event_id", "user_id", "value")
      .filter(col("user_id").isNotNull)
    Clustering.writeRangeClustered(events, dir, "user_id", nFiles = 8)

    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 4, s"expected several files, got ${files.length}")

    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("user_id")), max(col("user_id"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA <= loB, s"file ranges overlap: hi=$hiA vs next lo=$loB")
      case _ =>
    }

    // totality: nothing lost or duplicated by the re-layout
    assert(spark.read.parquet(dir).count() == events.count())
  }
}
