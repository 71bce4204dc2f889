package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MinHash + LSH-banding near-duplicate candidate generation.
  *
  * Pipeline: shingle set → polynomial rolling-hash base value
  * ([[graft.functions.RollingHash]], codegen'd) → k universal-hash
  * permutations `(a_i·x + b_i) mod p` minimized per document (one
  * hash-agg pass, map-side combinable) → signatures split into bands →
  * documents sharing any full band tuple become candidates.
  *
  * Every stage is engine-portable on purpose: the rolling hash is
  * reproducible from plain SQL (unlike Spark's murmur3), the (a_i, b_i)
  * constants are fixed at class-load from a seeded PRNG, and bands join
  * on the raw minhash TUPLE (no opaque re-hash) — so the whole
  * candidate-generation pipeline is DuckDB-oracle-checkable end to end
  * (d7), not just rows-counted.
  *
  * Scale: never materializes all pairs — the only join is the band-tuple
  * equi-join, and bucket sizes are bounded by collision probability, not
  * corpus size. This is the 100 TB path where exact n-gram Jaccard's
  * shingle join gets hot-key-heavy. Tune (numPerm, bandSize) for the
  * target Jaccard threshold: P(candidate) = 1 − (1 − j^r)^b.
  */
object MinHashDedup {
  val Prime = 2147483647L // 2^31 − 1, Mersenne; > any rolling-hash value

  /** The default permutation count / band width: 16 perms in 8 bands of
    * 2 → P(candidate | j=0.8) = 1−(1−0.64)^8 ≈ 0.9997 (high recall at
    * the 0.8 near-dup bar; band-collision noise is cheap because the
    * verify stage is a grouped count, not a document compare). */
  val DefaultNumPerm = 16
  val DefaultBandSize = 2

  /** (a_i, b_i) drawn once from a seeded PRNG — deterministic across
    * runs and JVMs (scala.util.Random is a wrapped java.util.Random,
    * whose LCG is specified), but pairwise-independent-looking, so band
    * collision probabilities track the 1−(1−j^r)^b model. Tiny
    * sequential multipliers (1,3,5,…) would correlate the permutations
    * (a=1 is the identity) and skew LSH recall/precision. Public: the
    * oracle SQL is generated from these same constants. */
  lazy val perms: IndexedSeq[(Long, Long)] = {
    val rng = new scala.util.Random(0x6d696e68L) // "minh"
    (0 until DefaultNumPerm).map { _ =>
      val a = math.floorMod(rng.nextLong(), (Prime - 1) / 2) * 2 + 1 // odd in [1, Prime)
      val b = math.floorMod(rng.nextLong(), Prime)
      (a, b)
    }
  }

  /** Portable base hash of one shingle (requires
    * [[graft.functions.GraftFunctions.register]] on the session). */
  private def baseHash(c: Column): Column =
    graft.functions.GraftFunctions.rollingHash(c)

  /** @param shingled (doc_id, sh: array<string>) — one row per document */
  def signatures(shingled: DataFrame, numPerm: Int = DefaultNumPerm): DataFrame = {
    require(numPerm <= perms.length, s"at most ${perms.length} permutations")
    graft.functions.GraftFunctions.register(shingled.sparkSession) // idempotent
    val hashed = shingled
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), baseHash(col("s")).as("h"))
    val mins = (0 until numPerm).map { i =>
      val (a, b) = perms(i)
      min((col("h") * a + b) % Prime).as(s"m$i")
    }
    hashed.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** The exploded LSH band table — (doc_id, b) where `b` is the raw
    * minhash tuple of one band (portable key; no opaque re-hash).
    * Persisted: every consumer (the self-join's two sides, or a
    * batch-vs-corpus probe) reads the materialized table instead of
    * re-running the shingle→hash→minhash pipeline. */
  def bandTable(
      shingled: DataFrame,
      numPerm: Int = DefaultNumPerm,
      bandSize: Int = DefaultBandSize): DataFrame = {
    require(numPerm % bandSize == 0, "numPerm must be a multiple of bandSize")
    val sigs = signatures(shingled, numPerm)
    val nBands = numPerm / bandSize
    val bands = (0 until nBands).map { j =>
      struct(
        lit(j).as("band_idx") +:
          (j * bandSize until (j + 1) * bandSize).map(i => col(s"m$i").as(s"v${i - j * bandSize}")): _*)
    }
    graft.core.Caching.cached(sigs
      .select(col("doc_id"), explode(array(bands: _*)).as("b")))
  }

  /** Candidate pairs: any shared LSH band tuple → (doc_a, doc_b, n_bands). */
  def candidatePairs(
      shingled: DataFrame,
      numPerm: Int = DefaultNumPerm,
      bandSize: Int = DefaultBandSize): DataFrame = {
    val exploded = bandTable(shingled, numPerm, bandSize)
    exploded.as("x")
      .join(exploded.as("y"),
        col("x.b") === col("y.b") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }
}
