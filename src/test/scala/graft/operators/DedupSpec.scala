package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (4L, "completely different text about distributed query engines and columnar formats here"),
    (5L, "yet another unrelated document mentioning spark catalyst optimizer rules only")
  ).toDF("doc_id", "text")

  private def shingled = graft.queries.TextOps.shingles(docs)

  test("MinHash signatures: identical docs get identical signatures") {
    val sigs = MinHashDedup.signatures(shingled).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
  }

  test("MinHash LSH candidate pairs include the exact dup pair, not unrelated docs") {
    val pairs = MinHashDedup.candidatePairs(shingled).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((4L, 5L)))
  }

  test("SimHash: identical docs equal; near-dups closer than unrelated docs") {
    val tok = docs.select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    val sig = SimHash.signatures(tok).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sig(1L) == sig(2L))
    assert(hamming(sig(1L), sig(3L)) < hamming(sig(1L), sig(4L)))
  }

  test("stop-shingle df cap leaves the Jaccard ≥ 0.5 result set unchanged") {
    import graft.queries.TextOps.jaccardPairs
    // corpus with a HOT boilerplate opening: the trigrams of the shared
    // prefix appear in every document (df = 8 > cap), while each
    // near-dup pair shares plenty of rare shingles
    val boiler = "subscribe to our newsletter for updates and exclusive offers today"
    val hot = Seq(
      (1L, s"$boiler the quick brown fox jumps over the lazy dog near the river"),
      (2L, s"$boiler the quick brown fox jumps over the lazy dog near the creek"),
      (3L, s"$boiler completely different text about distributed query engines and columnar formats"),
      (4L, s"$boiler completely different text about distributed query engines and row formats"),
      (5L, s"$boiler unrelated musings on compiler construction parsing tables and register allocation"),
      (6L, s"$boiler unrelated musings on compiler construction parsing tables and stack allocation"),
      (7L, s"$boiler a seventh document of entirely distinct words regarding sailing boats harbors"),
      (8L, s"$boiler an eighth text that shares nothing except the boilerplate prefix fragment")
    ).toDF("doc_id", "text")

    def pairs(cap: Long) = jaccardPairs(hot, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val capped = pairs(4L) // boilerplate trigrams (df=8) are excluded
    val uncapped = pairs(Long.MaxValue)
    assert(capped == uncapped,
      s"cap changed the result set: capped=$capped uncapped=$uncapped")
    assert(capped.exists(p => p._1 == 1L && p._2 == 2L), "near-dup pair 1-2 found")
    assert(capped.exists(p => p._1 == 3L && p._2 == 4L), "near-dup pair 3-4 found")
    // n_common still counts the hot shingles (exact verify on full sets)
    val boilerShingleCount = boiler.split(" ").length - 2
    assert(capped.find(p => p._1 == 1L && p._2 == 2L).get._3 > boilerShingleCount,
      "intersection must include capped-out hot shingles")
  }

  test("mass-duplicate cluster larger than the df cap keeps its Jaccard=1.0 pairs") {
    import graft.queries.TextOps.jaccardPairs
    // 60 identical boilerplate docs: every shingle has df=60 > cap=50, so
    // the rare-shingle channel generates ZERO candidates — the identical-
    // set fingerprint channel must recover all C(60,2) pairs (this is
    // exactly the mass-duplication case dedup exists for)
    val n = 60
    val txt = "subscribe to our newsletter for updates and exclusive offers today friends"
    val dups = (1 to n).map(i => (i.toLong, txt)) ++ Seq(
      (100L, "a completely unrelated document about distributed query engines and formats"),
      (101L, "another loner text mentioning catalyst optimizer rules and codegen stages"))
    val got = jaccardPairs(dups.toDF("doc_id", "text"), 50L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(got.size == n * (n - 1) / 2,
      s"expected all C($n,2) duplicate pairs, got ${got.size}")
    assert(got.forall(_._3 == 1.0))
    assert(got.forall(p => p._1 <= n && p._2 <= n), "loners must not pair")
  }

  test("upper-bound prefilter is result-preserving on the near-dup corpus") {
    import graft.queries.TextOps.jaccardPairs
    // documents table: rich mix of near/exact/unrelated docs — the capped
    // result must equal the uncapped one (corpus max df < cap) with the
    // prefilter active in both
    val corpus = graft.core.Tables(spark, sfDir, "documents")
      .select("doc_id", "text")
    def run(cap: Long) = jaccardPairs(corpus, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(50L) == run(Long.MaxValue))
  }

  test("d16 band bucketing recalls EXACTLY the brute-force Hamming ≤ 3 pairs") {
    // pigeonhole: ≤3 differing bits cannot touch all 4 16-bit bands, so
    // every qualifying pair shares an exact band — banded recall == 1
    // at this radius; the hamming filter removes band-collision noise.
    val corpus = graft.core.Tables(spark, sfDir, "documents")
    val banded = graft.queries.TextOps.d16SimHashPairs
      .build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tok = corpus.select(
      col("doc_id"),
      split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ").as("w"))
    val sig = SimHash.signatures(tok).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, sa) <- sig; (b, sb) <- sig
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    assert(banded == brute)
  }
}
