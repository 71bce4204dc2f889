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

  test("z-order degenerate keys: constant and all-NULL columns collapse to one bucket") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_zdegen").toString + "/z"
    val df = (1 to 1000).map(i => (i.toLong, 42.0, Option.empty[Double]))
      .toDF("id", "konst", "nul")
    // constant key (min==max) and an entirely-NULL key: neither may NPE
    // nor poison the z-value with NULL (which would randomize placement)
    Clustering.writeZOrdered(df, dir, Seq("id", "konst", "nul"), nFiles = 4)
    assert(spark.read.parquet(dir).count() == 1000)
    // the surviving real dimension still clusters: per-file id ranges
    // are disjoint because konst/nul contribute constant-zero bits
    val ranges = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min(col("id")), max(col("id"))).head
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) =>
        assert(hiA <= loB, s"degenerate dims must not scatter id: $ranges")
      case _ =>
    }
  }

  test("z-order layout keeps file stats tight on EVERY clustered dimension") {
    val base = Files.createTempDirectory("graft_zorder").toString
    val events = Tables(spark, sfDir, "events")
      .select("event_id", "user_id", "value")
      .filter(col("user_id").isNotNull)

    Clustering.writeZOrdered(events, s"$base/z", Seq("user_id", "value"), nFiles = 8)
    Clustering.writeRangeClustered(events, s"$base/lin", "user_id", nFiles = 8)

    def widths(dir: String, c: String): Seq[Double] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(min(col(c).cast("double")), max(col(c).cast("double"))).head
          r.getDouble(1) - r.getDouble(0)
        }
    val g = events.agg(
      max(col("user_id")) - min(col("user_id")),
      max(col("value")) - min(col("value"))).head
    val (gUser, gValue) = (g.getLong(0).toDouble, g.getDouble(1))
    def avg(xs: Seq[Double]) = xs.sum / xs.size

    // z-order: BOTH dimensions tight per file (each file ≈ a hyper-rect)
    val zUser = avg(widths(s"$base/z", "user_id"))
    val zValue = avg(widths(s"$base/z", "value"))
    assert(zUser <= 0.6 * gUser, s"z files must be tight on user_id: $zUser/$gUser")
    assert(zValue <= 0.6 * gValue, s"z files must be tight on value too: $zValue/$gValue")
    // lexicographic baseline: tight on the leading key ONLY — the second
    // dimension stays near-full-width, so a value predicate skips
    // nothing (this is why z-order exists)
    val linValue = avg(widths(s"$base/lin", "value"))
    assert(avg(widths(s"$base/lin", "user_id")) <= 0.3 * gUser)
    assert(linValue >= 0.7 * gValue && linValue >= 1.3 * zValue,
      s"1-D layout must be far looser on the non-leading dim: lin=$linValue z=$zValue")
    // totality
    assert(spark.read.parquet(s"$base/z").count() == events.count())
  }
}
