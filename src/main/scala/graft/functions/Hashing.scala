package graft.functions

import org.apache.spark.sql.Column
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

  /** MinHash signature (array<long> of length k) from an array of
    * shingle hashes. `array_min` over an affine reshuffle of the
    * per-shingle hashes; signed-long comparison is a fixed total order
    * — consistent everywhere, which is all min-wise hashing needs.
    */
  def minHashSignature(hashes: Column, k: Int = 128): Column = {
    val (a, b) = affineSeeds(k)
    val aLit = typedlit(a)
    val bLit = typedlit(b)
    val reduced = transform(hashes, h => pmod(h, lit(MinHashPrime)))
    transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(reduced,
        h => pmod(element_at(aLit, i + 1) * h + element_at(bLit, i + 1),
          lit(MinHashPrime)))))
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

  /** 64-bit SimHash over token hashes: bit j of the result is set iff
    * the sum over tokens of ±1 (sign of bit j of the token hash) is
    * non-negative.
    */
  def simHash64(hashes: Column): Column = {
    val masks = typedlit(BitMasks)
    val bitCols = transform(
      sequence(lit(0), lit(63)),
      j => when(
        aggregate(hashes, lit(0L),
          (acc, h) => acc +
            when(h.bitwiseAND(element_at(masks, j + 1)) =!= 0, 1L)
              .otherwise(-1L)) >= 0,
        element_at(masks, j + 1)).otherwise(0L))
    aggregate(bitCols, lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

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
