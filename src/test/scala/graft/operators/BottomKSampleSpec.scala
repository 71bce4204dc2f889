package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BottomKSampleSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(5)
  private val rows = (1 to 2000).map { i =>
    (s"key${i % 7}", Prioritized(rnd.nextLong(1
      << 40), s"item$i"))
  }

  test("aggregator equals the window row_number formulation, on any partitioning") {
    val expected = rows.toDF("k", "p")
      .select(col("k"), col("p.priority"), col("p.payload"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("priority"), col("payload"))))
      .filter(col("rn") <= 5)
      .select(col("k"), col("payload"), col("priority"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    Seq(1, 3, 16).foreach { parts =>
      val got = rows.toDS().repartition(parts)
        .groupByKey(_._1).mapValues(_._2)
        .agg(new BottomKSample(5).toColumn.name("sample"))
        .flatMap { case (k, ps) => ps.map(p => (k, p.payload, p.priority)) }
        .collect().toSet
      assert(got == expected, s"mismatch at $parts partitions")
    }
  }

  test("groups smaller than k return all their rows") {
    val small = Seq(("a", Prioritized(3, "x")), ("a", Prioritized(1, "y")), ("b", Prioritized(9, "z")))
    val got = small.toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(new BottomKSample(5).toColumn.name("sample"))
      .collect().toMap
    assert(got("a").map(_.payload) == Seq("y", "x")) // sorted by priority
    assert(got("b").map(_.payload) == Seq("z"))
  }
}
