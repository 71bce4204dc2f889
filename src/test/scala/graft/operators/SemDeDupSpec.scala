package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SemDeDup hot-cluster guard: a pathologically hot cluster shards
  * into bounded buckets (the join key becomes (label, shard), so no
  * single task carries |c|² pair work), results stay identical to the
  * unguarded all-pairs join, and at-or-under-cap clusters use one
  * shard. */
class SemDeDupSpec extends SparkSpec {

  private def cos(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x) /
      (sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x)) *
        sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x)))

  // cluster 0: 60 vectors (hot); clusters 1..3: 5 each. Vectors are
  // 2-d unit-ish points on a few directions so some pairs clear the
  // threshold deterministically.
  private def fixture: DataFrame = {
    import spark.implicits._
    val rows = (0L until 60L).map { i =>
      val ang = (i % 6) * 0.5
      (i, 0, Seq(math.cos(ang), math.sin(ang)))
    } ++ (0 until 3).flatMap { c =>
      (0L until 5L).map { i =>
        val ang = c + i * 0.7
        (100L + c * 10 + i, c + 1, Seq(math.cos(ang), math.sin(ang)))
      }
    }
    rows.toDF("vec_id", "label", "v")
  }

  private def naive(e: DataFrame): Set[(Int, Long)] =
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .filter(cos(col("a.v"), col("b.v")) >= 0.80)
      .select(col("b.label"), col("b.vec_id")).distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet

  test("hot cluster shards to bounded buckets; results identical to all-pairs") {
    val e = fixture
    val guarded = SemDeDup.dups(e, cos, 0.80, shardCap = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(guarded == naive(e), "guarded results must equal the naive join")
    assert(guarded.nonEmpty, "fixture must produce duplicates")

    // the hot cluster engages ceil(60/10) = 6 shards; the b side of
    // each is deterministically bounded (hash split of 60 ids)
    val sizes = e.groupBy(col("label")).agg(count(lit(1)).as("cn"))
      .select(col("label"),
        ceil(col("cn") / lit(10.0)).cast("int").as("nsh"))
    val shards = e.join(broadcast(sizes), "label")
      .withColumn("sb", pmod(xxhash64(col("vec_id")), col("nsh").cast("long")))
      .groupBy(col("label"), col("sb")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val hot = shards.filter(_._1 == 0)
    assert(hot.length == 6, s"hot cluster must split into 6 shards: ${hot.toSeq}")
    assert(hot.map(_._3).max <= 20,
      s"no shard may approach the unsplit size: ${hot.toSeq}")
    // normal clusters stay single-shard — the plan is the plain join
    assert(shards.filter(_._1 != 0).forall(_._2 == 0L),
      s"at-or-under-cap clusters must use one shard: ${shards.toSeq}")
  }
}
