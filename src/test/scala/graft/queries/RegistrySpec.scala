package graft.queries

import org.apache.spark.sql.functions._

import graft.{Registry, SparkEntry, SparkSpec}
import graft.core.Tables

/** Smoke + invariant checks over the full query registry at sf0.001.
  * (Value-level correctness is the DuckDB-oracle harness; these tests
  * pin structural invariants that hold independent of scale.) */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and every query has a doc") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(Registry.all.forall(_.doc.nonEmpty))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes at sf0.001 and returns rows (or is a valid empty diff)") {
    val mayBeEmpty = Set("q14_customers_without_orders", "q18_except")
    Registry.all.foreach { q =>
      val n = q.build(spark, sfDir).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("semi + anti join partition the left table") {
    val c = Tables(spark, sfDir, "customer").count()
    val semi = Registry.byName("q13_customers_with_orders").build(spark, sfDir).count()
    val anti = Registry.byName("q14_customers_without_orders").build(spark, sfDir).count()
    assert(semi + anti == c)
  }

  test("union_all row count is the sum of its inputs") {
    val c = Tables(spark, sfDir, "customer").count()
    val s = Tables(spark, sfDir, "supplier").count()
    assert(Registry.byName("q16_union_all").build(spark, sfDir).count() == c + s)
  }

  test("exact dedup keeps every distinct normalized document") {
    val docs = Tables(spark, sfDir, "documents")
    val distinctNorm = docs
      .select(regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("t"))
      .distinct().count()
    val dedup = Registry.byName("d1_dedup_exact").build(spark, sfDir)
    assert(dedup.count() == distinctNorm)
    // keeper copies sum back to the corpus size
    val total = dedup.agg(sum(col("n_copies"))).collect()(0).getLong(0)
    assert(total == docs.count())
  }

  test("s10 sign projection preserves norms in expectation (JL property)") {
    graft.functions.GraftFunctions.register(spark)
    val proj = Registry.byName("s10_random_projection").build(spark, sfDir)
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // E[|Sv|²] = k·|v|² for ±1 sign matrices → |Sv|²/(k·|v|²) ≈ 1
    val p2 = (0 until 8).map(j => col(s"p$j") * col(s"p$j")).reduce(_ + _)
    val ratios = proj.join(e, "vec_id")
      .select((p2 / lit(8.0) / expr("graft_dot(v, v)")).as("ratio"))
    val mean = ratios.agg(avg(col("ratio"))).head.getDouble(0)
    assert(mean > 0.85 && mean < 1.15, s"norm-preservation mean ratio $mean")
    val med = ratios.stat.approxQuantile("ratio", Array(0.5), 0.01).head
    assert(med > 0.5 && med < 2.0, s"median ratio $med")
  }

  test("top-k queries respect their limits") {
    assert(Registry.byName("q2_top_customers").build(spark, sfDir).count() <= 10)
    assert(Registry.byName("q23_top_lineitems").build(spark, sfDir).count() == 20)
    assert(Registry.byName("s1_cosine_topk").build(spark, sfDir).count() == 10)
  }

  test("cosine similarity values stay in [-1, 1]") {
    val sims = Registry.byName("s1_cosine_topk").build(spark, sfDir)
      .select(col("sim")).collect().map(_.getDouble(0))
    assert(sims.forall(s => s >= -1.0000001 && s <= 1.0000001))
  }

  test("d22 temperature mixture flattens the head domain, respects budgets") {
    val docs = Tables(spark, sfDir, "documents")
    val corpus = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = corpus.values.sum.toDouble
    val kept = Registry.byName("d22_domain_mixture").build(spark, sfDir)
    val keptBy = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // never over budget, and never more than the domain has
    val budgets = kept.select("lang", "lang_target").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    budgets.foreach { case (l, b) =>
      assert(keptBy(l) <= b && keptBy(l) <= corpus(l), s"$l kept=${keptBy(l)} budget=$b n=${corpus(l)}")
    }
    // α=0.5 smoothing: the head domain's sample share drops below its
    // corpus share; the smallest domain's share rises
    val head = corpus.maxBy(_._2)._1
    val tail = corpus.minBy(_._2)._1
    val keptTotal = keptBy.values.sum.toDouble
    assert(keptBy(head) / keptTotal < corpus(head) / total,
      s"head $head share must shrink")
    assert(keptBy(tail) / keptTotal > corpus(tail) / total,
      s"tail $tail share must grow")
  }

  test("d23 keeps exactly one doc per cluster, the quality argmax") {
    val keepers = Registry.byName("d23_canonical_docs").build(spark, sfDir)
    // one keeper per cluster, clusters partition the corpus
    assert(keepers.select("cluster_id").distinct().count() == keepers.count())
    assert(keepers.agg(sum(col("cluster_size"))).head.getLong(0) ==
      Tables(spark, sfDir, "documents").count())
    // keeper quality is the cluster max (re-derive membership from d12)
    val members = Registry.byName("d12_dedup_clusters").build(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"))
      .join(Registry.byName("d4_quality_score").build(spark, sfDir)
        .select(col("doc_id"), col("quality_score")), Seq("doc_id"))
    val maxQ = members.groupBy("cluster_id")
      .agg(max(col("quality_score")).as("max_q"))
    val bad = keepers.join(maxQ, Seq("cluster_id"))
      .filter(col("keeper_quality") < col("max_q")).count()
    assert(bad == 0, s"$bad clusters kept a non-argmax doc")
  }

  test("every oracle references only known table names") {
    val known = Tables.names.toSet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val lower = sql.toLowerCase
      assert(known.exists(lower.contains), s"$name oracle references no known table")
    }
  }
}
