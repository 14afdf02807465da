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
  private[graft] def affineSeeds(k: Int): (Seq[Long], Seq[Long]) = {
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
    * One native scalar expression per row ([[MinHashSig]]): a
    * signature is a pure function of the shingle set, so it runs
    * map-side with zero shuffle and no aggregation state. (Round 1
    * used explode + k grouped MIN aggregates — correct, but it
    * shuffled a row per shingle and a 128-buffer HashAggregate costs
    * ~16 s of one-time codegen/JIT; the nested-HOF form is worse
    * still, re-evaluating the inner array per outer element,
    * interpreted.) Values are bit-identical across all three shapes.
    */
  def minHashSignatures(df: DataFrame, idCol: String, shinglesCol: String,
      k: Int = 128): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    df.select(col(idCol),
        GraftSqlBridge.column(
          MinHashSig(GraftSqlBridge.expression(col(shinglesCol)), k)).as("sig"))
      .filter(col("sig").isNotNull)
  }

  /** As [[minHashSignatures]], additionally carrying `hs` — the
    * sorted distinct 64-bit shingle-hash array, the canonical
    * content encoding — so callers can derive exact-content hashes
    * (q37's (n, h1, h2) shortcut) in the SAME map-side projection
    * instead of a second pass or a join.
    */
  def minHashSignaturesWithContent(df: DataFrame, idCol: String,
      shinglesCol: String, k: Int = 128): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    df.select(col(idCol),
        GraftSqlBridge.column(
          MinHashSig(GraftSqlBridge.expression(col(shinglesCol)), k)).as("sig"),
        array_sort(array_distinct(shingleHashes(col(shinglesCol)))).as("hs"))
      .filter(col("sig").isNotNull)
  }

  /** SimHash codes as a DataFrame stage: (id, shingles array) →
    * (id, simhash long). Same shape as [[minHashSignatures]]: one
    * native per-row expression ([[SimHashSig]]), map-side, no shuffle.
    */
  def simHashes(df: DataFrame, idCol: String, shinglesCol: String): DataFrame =
    df.select(col(idCol), simHashCol(col(shinglesCol)).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** [[SimHashSig]] as a bare Column — for callers that fuse the
    * signature into a wider single-pass projection (q36 computes sim +
    * exact-signature fields in ONE corpus pass since r16).
    */
  def simHashCol(shingles: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      SimHashSig(GraftSqlBridge.expression(shingles)))
  }

  /** LSH band keys: hash of each r-row slice of the signature
    * (b bands × r rows = k). Returns array<long> of length b; a pair
    * with Jaccard j collides in some band with prob 1-(1-j^r)^b.
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      j => xxhash64(slice(sig, j * rows + 1, lit(rows))))

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

  /** Second-level SimHash blocking key: 7-bit sub-chunks of the 56
    * bits that REMAIN after deleting chunk `chunkIdx` from the code.
    *
    * Used to re-block a level-1 bucket that overflows the bucket cap
    * (every member shares chunk `chunkIdx`, so at corpus scale a
    * popular 8-bit chunk value collects ~N/256 docs and the cap would
    * otherwise silently DROP the bucket — the recall cliff). Within
    * such a bucket, a pair at Hamming ≤ 7 has all ≤7 differing bits
    * inside these 56 remainder bits, so by pigeonhole over 8
    * sub-chunks it agrees on at least one — the guarantee stays exact
    * one level down, on buckets ~128× smaller.
    *
    * All shifts are static (the dynamic `chunkIdx` selects among 8
    * statically-shifted branches), so the whole key stays inside
    * whole-stage codegen.
    */
  def simHashSubChunks(sim: Column, chunkIdx: Column): Column = {
    val rem = (0 until 8).foldLeft(lit(0L)) { (acc, i) =>
      val r =
        if (i == 7) sim.bitwiseAND(lit(0x00FFFFFFFFFFFFFFL))
        else shiftleft(shiftrightunsigned(sim, 8 * (i + 1)), 8 * i)
          .bitwiseOR(sim.bitwiseAND(lit((1L << (8 * i)) - 1)))
      when(chunkIdx === i, r).otherwise(acc)
    }
    array((0 until 8).map(k =>
      shiftrightunsigned(rem, 7 * k).bitwiseAND(lit(0x7FL))): _*)
  }

  /** Third-level SimHash blocking key: the 8 STRIDE-INTERLEAVED 8-bit
    * chunks of the full code — chunk k collects bits {k, k+8, …,
    * k+56}. Pigeonhole holds for ANY partition of the 64 bits into 8
    * chunks: a pair within Hamming ≤ 7 has its ≤ 7 differing bits in
    * at most 7 chunks, so it agrees on ≥ 1 — exactly, at every level.
    *
    * Used to re-block a LEVEL-2 sub-bucket that still overflows the
    * cap (found by the ×1024 distinct probe, r12: at ~5 M docs the
    * typical level-2 sub-bucket holds ~N/256/128 ≳ 150 members and
    * near-pair recall collapsed — 16 k pairs where ~231 k were due;
    * drops were observed, never silent, but observed ≠ recovered).
    * Scoped INSIDE the level-2 key, the interleave is a fresh
    * subdivision: members already agree on 15 contiguous bits, which
    * pin only ~2 of each interleaved chunk's 8 bits, so buckets
    * shrink by ~2⁶ per level-3 key — the same ÷two-orders step the
    * first two levels take. All shifts static; stays in codegen.
    */
  def simHashInterleavedChunks(sim: Column): Column =
    array((0 until 8).map { k =>
      (0 until 8).foldLeft(lit(0L)) { (acc, j) =>
        acc.bitwiseOR(shiftleft(
          shiftrightunsigned(sim, 8 * j + k).bitwiseAND(lit(1L)), j))
      }
    }: _*)

  /** K-minimum-values sketch (winnowing-style fingerprint): the k
    * smallest distinct shingle hashes — a compact, mergeable document
    * fingerprint whose overlap estimates containment.
    */
  def kMinSketch(hashes: Column, k: Int = 8): Column =
    slice(array_sort(array_distinct(hashes)), 1, k)
}
