package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MinHash + LSH-banding near-duplicate candidate generation.
  *
  * Pipeline: shingle set → murmur3 base hash (Spark's codegen'd `hash`)
  * → k universal-hash permutations `(a_i·x + b_i) mod p` minimized per
  * document (one hash-agg pass, map-side combinable) → signatures split
  * into bands → documents sharing any band bucket become candidates.
  *
  * Scale: never materializes all pairs — the only join is the band-bucket
  * equi-join, and bucket sizes are bounded by collision probability, not
  * corpus size. This is the 100 TB path where exact n-gram Jaccard's
  * shingle join gets hot-key-heavy. Tune (numPerm, bandSize) for the
  * target Jaccard threshold: P(candidate) = 1 − (1 − j^r)^b.
  */
object MinHashDedup {
  private val Prime = 2147483647L // 2^31 − 1, Mersenne

  /** @param shingled (doc_id, sh: array<string>) — one row per document */
  def signatures(shingled: DataFrame, numPerm: Int = 16): DataFrame = {
    val hashed = shingled
      .select(col("doc_id"), explode(col("sh")).as("s"))
      // murmur3 → non-negative 31-bit base hash
      .select(col("doc_id"), (hash(col("s")).cast(LongType).bitwiseAND(lit(0x7fffffffL))).as("h"))
    // (a_i, b_i) drawn from a seeded PRNG — deterministic across runs but
    // pairwise-independent-looking, so band collision probabilities track
    // the 1−(1−j^r)^b model. Tiny sequential multipliers (1,3,5,…) would
    // correlate the permutations (a=1 is the identity) and skew LSH
    // recall/precision.
    val rng = new scala.util.Random(0x6d696e68L) // "minh"
    val perms = (0 until numPerm).map { i =>
      val a = (math.floorMod(rng.nextLong(), (Prime - 1) / 2)) * 2 + 1 // odd in [1, Prime)
      val b = math.floorMod(rng.nextLong(), Prime)
      min((col("h") * a + b) % Prime).as(s"m$i")
    }
    hashed.groupBy(col("doc_id")).agg(perms.head, perms.tail: _*)
  }

  /** Candidate pairs: any shared LSH band bucket → (doc_a, doc_b, n_bands). */
  def candidatePairs(shingled: DataFrame, numPerm: Int = 16, bandSize: Int = 4): DataFrame = {
    require(numPerm % bandSize == 0, "numPerm must be a multiple of bandSize")
    val sigs = signatures(shingled, numPerm)
    val nBands = numPerm / bandSize
    val bands = (0 until nBands).map { j =>
      struct(
        lit(j).as("band_idx"),
        hash((j * bandSize until (j + 1) * bandSize).map(i => col(s"m$i")): _*)
          .as("band_hash"))
    }
    // persisted: both sides of the bucket self-join read this — without
    // the barrier the whole shingle→hash→minhash pipeline runs twice
    val exploded = sigs
      .select(col("doc_id"), explode(array(bands: _*)).as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band_hash"))
      .persist()
    exploded.as("x")
      .join(exploded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }
}
