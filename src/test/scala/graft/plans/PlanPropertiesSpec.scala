package graft.plans

import graft.{Registry, SparkSpec}

/** Plan-shape regression guards: the scale properties PLANS.md claims,
  * asserted against the AQE-final physical plan so a future edit that
  * quietly adds a shuffle or drops a broadcast fails CI instead of
  * surfacing as a 100 TB incident.
  *
  * Exchange counting excludes the corpus-artifact rebalance
  * (REPARTITION_BY_NUM from `core.Tables` on the single-row-group test
  * files) — only ENSURE_REQUIREMENTS exchanges are plan-intrinsic.
  */
class PlanPropertiesSpec extends SparkSpec {

  private def finalPlan(name: String): String = {
    val df = Registry.byName(name).build(spark, sfDir)
    df.write.mode("overwrite").format("noop").save()
    df.queryExecution.executedPlan.toString
  }

  private def count(plan: String, token: String): Int =
    plan.sliding(token.length).count(_ == token)

  private def finalExec(name: String): org.apache.spark.sql.execution.SparkPlan = {
    val df = Registry.byName(name).build(spark, sfDir)
    df.write.mode("overwrite").format("noop").save()
    df.queryExecution.executedPlan
  }

  /** Structural collect that descends through AQE wrappers — query
    * stages are leaf nodes whose materialized plan hides in `.plan`, so
    * a plain `SparkPlan.collect` never sees inside a finished stage. */
  private def deepCollect[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val here = pf.lift(p).toSeq
    // InMemoryTableScanExec is deliberately a boundary: a cached table's
    // one-time build plan (with its own exchanges) is the standing index,
    // not per-query work — guards below reason about shuffles ABOVE it.
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case other                    => other.children
    }
    here ++ kids.flatMap(deepCollect(_)(pf))
  }

  test("q1: single intrinsic shuffle, partial agg before it") {
    val p = finalPlan("q1_pricing_summary")
    assert(count(p, "ENSURE_REQUIREMENTS") == 1, p)
    assert(p.contains("partial_"), "map-side partial aggregation expected")
  }

  test("q2: dim joins broadcast — no sort-merge join anywhere") {
    val p = finalPlan("q2_top_customers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "dim must broadcast, not shuffle")
  }

  test("q19: only the fact-to-fact join shuffles; all dims broadcast") {
    val p = finalPlan("q19_region_revenue")
    assert(count(p, "BroadcastHashJoin") >= 3, "region/nation/customer broadcast")
    // lineitem⋈orders is the one join allowed to exchange (plus its agg)
    assert(count(p, "ENSURE_REQUIREMENTS") <= 3, p)
  }

  test("q43: argmax is a pure aggregate — one shuffle, partial agg, no window") {
    val p = finalPlan("q43_latest_order_argmax")
    assert(count(p, "ENSURE_REQUIREMENTS") == 1, p)
    assert(!p.contains("Window"), "struct-max must not plan a window")
    // struct buffers aren't hash-aggregable: Spark plans SortAggregate
    // (per-partition sort by group key) — the partial agg still runs
    // map-side, so the exchange carries one struct per key per task
    assert(p.contains("partial_max"), "map-side partial max expected")
  }

  test("s2: corpus never shuffles — broadcast nested loop + one window exchange") {
    val p = finalPlan("s2_knn_batch")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(count(p, "ENSURE_REQUIREMENTS") <= 1, "only the per-query ranking may exchange")
  }

  test("q51: the generated calendar grid broadcasts; no cartesian product") {
    val p = finalPlan("q51_gap_fill")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), "grid side must broadcast")
  }

  test("q49: salted join broadcasts the replicated right side at this scale") {
    val p = finalPlan("q49_salted_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), "salting must stay an equi-join")
  }

  test("q55: RANGE frame plans one window over one intrinsic exchange") {
    val p = finalPlan("q55_trailing_window")
    assert(p.contains("RangeFrame"), "value-based frame expected")
    // (in the spec session the corpus rebalance never fires —
    // scanParts*4 !< 4 — so the window plans its own single exchange;
    // under the bench session the keyed rebalance doubles as it)
    assert(count(p, "ENSURE_REQUIREMENTS") == 1, p)
  }

  test("q56: hash sample is a pure scan filter — no shuffle, no sort, no window") {
    val p = finalPlan("q56_hash_sample")
    assert(count(p, "ENSURE_REQUIREMENTS") == 0, p)
    assert(!p.contains("Window") && !p.contains("Sort"), p)
  }

  test("q57: merge upsert is one join — no row multiplication operators") {
    val p = finalPlan("q57_merge_upsert")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("FullOuter") || p.contains("full_outer") || p.contains("FULL OUTER"), p)
  }

  test("s9: unit-vector corpus never shuffles — query side broadcasts") {
    val p = finalPlan("s9_unitvec_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(count(p, "ENSURE_REQUIREMENTS") == 0,
      "top-k must be TakeOrderedAndProject, not a global sort exchange")
  }

  test("q59: window distinct set agg stays a single exchange") {
    val p = finalPlan("q59_window_distinct")
    assert(p.contains("Window"), p)
    assert(count(p, "ENSURE_REQUIREMENTS") == 1, p)
  }

  test("d6: stop-list excluded via broadcast anti join; no cartesian anywhere") {
    val p = finalPlan("d6_ngram_jaccard")
    // the df>cap stop-list must broadcast (tiny Zipf head) — the
    // exploded table itself must never shuffle just to apply the cap
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "near-dup pairs must come from the shingle equi-join, never all-pairs")
    assert(p.contains("InMemoryTableScan"),
      "shingle arrays must come from the persist barrier")
  }

  test("s10: random projection is map-only — zero intrinsic exchanges") {
    val p = finalPlan("s10_random_projection")
    assert(count(p, "ENSURE_REQUIREMENTS") == 0,
      "projection must not shuffle: k dot products against literal rows")
    assert(!p.contains("Join"), p)
  }

  test("q35: two-phase distinct — no Expand, partial agg both phases") {
    val p = finalPlan("q35_approx_distinct")
    assert(!p.contains("Expand"),
      "multi-distinct must use the two-phase form, not Expand row doubling")
    assert(p.contains("partial_"), p)
  }

  test("q68: CDC merge keeps q57's one-join shape — deletes add no operators") {
    val p = finalPlan("q68_cdc_apply")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("FullOuter") || p.contains("full_outer") || p.contains("FULL OUTER"), p)
  }

  test("q69: point-in-time lookup is the as-of union sweep, not a per-row range scan") {
    val p = finalPlan("q69_pit_lookup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of must not degrade to an all-pairs range comparison")
    assert(p.contains("Window"), "the single window sweep is the operator core")
  }

  test("d19: contamination probe is an equi-join + partial-agged groupBy") {
    val p = finalPlan("d19_contamination")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "eval-shingle probe must be an equi-join, never all-pairs")
    assert(p.contains("partial_"), "per-doc counts must partial-aggregate map-side")
  }

  test("s13: batched ANN core — probe + LUT joins all broadcast, no cartesian over corpus") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.{IvfIndex, PqIndex}
    val e = graft.core.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v")).persist()
    val queries = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val cent = IvfIndex.centroids(e, k = 16, iters = 1)
    val cbs = PqIndex.codebooks(e, 64, m = 8, k = 16, iters = 1)
    val codes = PqIndex.encode(e, 64, cbs)
    val members = IvfIndex.assign(e, cent)
      .join(broadcast(IvfIndex.probeBatch(queries, cent, nprobe = 4)), Seq("cid"))
      .filter(col("vec_id") =!= col("qid")).select(col("qid"), col("vec_id"))
    val adc = PqIndex.adcBatch(queries, 64, cbs, members.join(codes, Seq("vec_id")))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))
    val df = adc.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 50)
    df.write.mode("overwrite").format("noop").save()
    val p = df.queryExecution.executedPlan.toString
    e.unpersist()
    // the 8 per-subspace LUT joins + the probed-cell join must all
    // broadcast (Q·k-row tables); the corpus may not be cartesianed
    assert(!p.contains("CartesianProduct"), p)
    assert(this.count(p, "BroadcastHashJoin") >= 9,
      s"expected >= 9 broadcast joins (8 LUTs + cell probe):\n$p")
  }

  test("d24: corpus-window exchanges carry the 8-byte hash, never the text") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
    // The candidate-discovery aggregation over every window of every
    // document — the widest exchange in the query. Its shuffled rows
    // must be (hash, doc_id) only: shipping the raw 40-char window text
    // here is the ~40x-corpus-bytes shape round 9 flagged.
    val docs = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val agg = graft.queries.TextOps.substrWindowHashes(docs, 40)
      .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
    agg.write.mode("overwrite").format("noop").save()
    val fin = agg.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def exchangeOutputs(p: SparkPlan): Seq[Seq[org.apache.spark.sql.catalyst.expressions.Attribute]] =
      p.collect {
        case s: ShuffleQueryStageExec => Seq(s.plan.output) ++ exchangeOutputs(s.plan)
        case e: ShuffleExchangeExec   => Seq(e.output)
      }.flatten
    val outs = exchangeOutputs(fin)
    assert(outs.nonEmpty, fin.toString)
    outs.foreach { o =>
      assert(!o.exists(_.dataType == StringType),
        s"window exchange must not carry a string column: $o")
    }
    // and the registry query itself runs the hash pre-bucket
    val p = finalPlan("d24_substring_dedup")
    assert(p.contains("xxhash64"), "d24 must pre-bucket by xxhash64")
  }

  test("d34: corpus joins via broadcast semi — only batch-sized exchanges") {
    val p = finalPlan("d34_incremental_dedup")
    // the corpus side must meet the batch hash set in a broadcast
    // LeftSemi (map-side filter), never a shuffled join
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), "corpus must not shuffle to join")
    assert(!p.contains("CartesianProduct"), p)
    // intrinsic exchanges are all batch-sized: the batch-hash distinct,
    // the candidate-key distinct (post-semi-filter), the batch window
    assert(count(p, "ENSURE_REQUIREMENTS") <= 3, p)
    assert(p.contains("xxhash64"), "corpus prefilter must be the 8-byte hash")
  }

  test("d27: trigram model broadcasts — the scoring join never shuffles the corpus by trigram") {
    // A shuffle join keyed on the trigram would hot-key on stop-trigrams
    // (' th' alone is percents of English text); the model table is
    // bounded by |charset|^3, so it must broadcast onto the scoring pass.
    val p = finalPlan("d27_trigram_lm")
    assert(p.contains("BroadcastHashJoin"),
      s"trigram model must broadcast onto the scoring pass:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join keyed on the trigram:\n$p")
  }

  test("d15: id assignment windows are shard-partitioned — no global sort") {
    val p = finalPlan("d15_vocab_build")
    assert(p.contains("Window"), p)
    // a no-partition window plans Exchange SinglePartition — the one
    // shape that serializes the whole vocabulary through a single task
    assert(!p.contains("SinglePartition"),
      s"vocab id assignment must not plan a single-partition window:\n$p")
  }

  test("d36: chunking is map-only — zero intrinsic exchanges, one Generate") {
    val p = finalPlan("d36_chunk_windows")
    assert(count(p, "ENSURE_REQUIREMENTS") == 0, p)
    assert(p.contains("Generate"), "window starts must explode via Generate")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"), p)
  }

  test("d35: eval joins stay bounded — no cartesian product anywhere") {
    val p = finalPlan("d35_lsh_eval")
    assert(!p.contains("CartesianProduct"), p)
    // the d6 side's stop-list exclusion must keep its broadcast shape
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("s18: corpus never shuffles — broadcast probes both sides, no SMJ over vectors") {
    val p = finalPlan("s18_ann_recall")
    assert(!p.contains("CartesianProduct"), p)
    // exact side: corpus × broadcast(queries) is a nested-loop over the
    // broadcast, never a shuffle of the vector table
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("m8: scene detection is one frame-order window keyed by media") {
    val p = finalPlan("m8_scene_detect")
    assert(count(p, "Window") == 1, p)
    assert(!p.contains("SinglePartition"),
      s"per-video lag must partition by media_id, not serialize:\n$p")
  }

  test("d37: corpus band index never shuffles — batch bands broadcast onto it") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    val plan = finalExec("d37_incremental_neardup")
    // Structural (not string) guard: the probe must plan as a
    // BroadcastHashJoin whose STREAMED side reads the cached band table
    // with NO exchange between the cache scan and the join — an aliased
    // band column or struct key can't hide a corpus shuffle from this.
    val probes = deepCollect(plan) { case j: BroadcastHashJoinExec => j }
      .filter { j =>
        val streamed = j.buildSide match {
          case BuildRight => j.left
          case BuildLeft  => j.right
        }
        deepCollect(streamed) { case s: InMemoryTableScanExec => s }.nonEmpty &&
          deepCollect(streamed) { case e: ShuffleExchangeLike => e }.isEmpty
      }
    assert(probes.nonEmpty,
      s"expected a broadcast probe join streaming the cached band index shuffle-free:\n$plan")
    // And globally: the only exchanges allowed are batch-sized (candidate
    // agg, batch distinct, the batch-side left join) — a corpus shuffle
    // would add one. Bound the total so a regression can't hide.
    val nShuffles = deepCollect(plan) { case e: ShuffleExchangeLike => e }.size
    assert(nShuffles <= 4,
      s"unexpected extra exchange ($nShuffles) — did the standing index start shuffling?\n$plan")
  }

  test("q110: variant extraction plans one partial-agged exchange, no Expand") {
    val p = finalPlan("q110_variant")
    assert(count(p, "ENSURE_REQUIREMENTS") == 1, p)
    assert(p.contains("partial_"), "map-side partial aggregation expected")
    assert(!p.contains("Expand"), p)
  }
}
