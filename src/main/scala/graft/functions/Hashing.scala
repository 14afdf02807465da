package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash / SimHash / fingerprint column builders (SURVEY.md §2
  * q33, q35–q37).
  *
  * All signatures are computed with higher-order array functions over
  * one base `xxhash64` per shingle — everything stays inside
  * whole-stage codegen, per-row, shuffle-free. Only the (small) band
  * keys are ever exploded, never the text.
  */
object Hashing {

  /** Mersenne prime 2^31-1: the affine field. 31-bit coefficients ×
    * 31-bit reduced hashes stay < 2^62 — no long overflow, which
    * matters because Spark 4 runs ANSI mode (overflow THROWS, it
    * doesn't wrap).
    */
  val MinHashPrime = 2147483647L

  /** K pseudo-random affine permutations h_i(x) = a_i·x + b_i over
    * Z/(2^31-1). Seeds are fixed so signatures are deterministic
    * across runs/partitions.
    */
  private def affineSeeds(k: Int): (Seq[Long], Seq[Long]) = {
    val rnd = new java.util.Random(0x5EED5EEDL)
    val a = Seq.fill(k)((rnd.nextInt(Int.MaxValue - 1) + 1).toLong)
    val b = Seq.fill(k)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  /** 64-bit hash per shingle string. */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, s => xxhash64(s))

  /** MinHash signatures as a DataFrame stage: (id, shingles array) →
    * (id, sig array<long> of length k).
    *
    * Shape matters for scale: explode the shingles ONCE and compute
    * the k permutation-minima as k grouped MIN aggregates — all
    * whole-stage-codegen'd with map-side partial aggregation, so the
    * shuffle carries only k longs per doc and the text pipeline runs
    * exactly once per shingle. (The tempting nested-HOF form
    * `transform(0..k, i -> array_min(transform(hashes, ...)))`
    * re-evaluates the inner array per outer element — k× the whole
    * tokenize/hash pipeline per ROW — and falls out of codegen.)
    */
  def minHashSignatures(df: DataFrame, idCol: String, shinglesCol: String,
      k: Int = 128): DataFrame = {
    val (a, b) = affineSeeds(k)
    val exploded = df
      .select(col(idCol), explode(col(shinglesCol)).as("_sh"))
      .select(col(idCol), pmod(xxhash64(col("_sh")), lit(MinHashPrime)).as("_h"))
    val mins = (0 until k).map(i =>
      min(pmod(col("_h") * a(i) + b(i), lit(MinHashPrime))).as(s"_m$i"))
    exploded
      .groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"_m$i")): _*).as("sig"))
  }

  /** SimHash codes as a DataFrame stage: (id, shingles array) →
    * (id, simhash long). Same explode+groupBy shape as
    * [[minHashSignatures]]: 64 conditional-SUM aggregates (±1 per
    * bit), then the bits packed into one long.
    */
  def simHashes(df: DataFrame, idCol: String, shinglesCol: String): DataFrame = {
    val exploded = df
      .select(col(idCol), explode(col(shinglesCol)).as("_sh"))
      .select(col(idCol), xxhash64(col("_sh")).as("_h"))
    val sums = BitMasks.zipWithIndex.map { case (m, i) =>
      sum(when(col("_h").bitwiseAND(m) =!= 0, 1L).otherwise(-1L)).as(s"_b$i")
    }
    val packed = BitMasks.zipWithIndex.map { case (m, i) =>
      when(col(s"_b$i") >= 0, m).otherwise(0L)
    }.reduce((x, y) => x.bitwiseOR(y))
    exploded
      .groupBy(col(idCol))
      .agg(sums.head, sums.tail: _*)
      .select(col(idCol), packed.as("simhash"))
  }

  /** LSH band keys: hash of each r-row slice of the signature
    * (b bands × r rows = k). Returns array<long> of length b; a pair
    * with Jaccard j collides in some band with prob 1-(1-j^r)^b.
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      j => xxhash64(slice(sig, j * rows + 1, lit(rows))))

  private val BitMasks: Seq[Long] = (0 until 64).map(1L << _)

  /** 8-bit chunks of a SimHash. Two codes within Hamming distance 7
    * must agree on ≥1 of 8 chunks (pigeonhole) → exact-match blocking
    * key for the Hamming join. 8 chunks (vs 4×16-bit) because short
    * documents have small per-bit margins: genuine near-dups land at
    * Hamming 4–7, not 0–3.
    */
  def simHashChunks(sim: Column): Column =
    array((0 until 8).map(i =>
      shiftright(sim, 8 * i).bitwiseAND(lit(0xFFL))): _*)

  /** Hamming distance between two 64-bit codes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** K-minimum-values sketch (winnowing-style fingerprint): the k
    * smallest distinct shingle hashes — a compact, mergeable document
    * fingerprint whose overlap estimates containment.
    */
  def kMinSketch(hashes: Column, k: Int = 8): Column =
    slice(array_sort(array_distinct(hashes)), 1, k)
}
