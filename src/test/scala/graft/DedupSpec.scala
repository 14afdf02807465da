package graft

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  /** Brute-force word-2-shingle Jaccard pairs ≥ τ (ground truth for
    * the LSH path; 500 docs → 125k pairs, fine at test scale).
    */
  private lazy val bruteforcePairs: Set[(Long, Long)] = {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(T.wordNGrams(T.tokens(col("text")), 2)).as("sh"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size.toDouble if j >= 0.5
    } yield (a, b)).toSet
  }

  test("q35 MinHash-LSH finds exactly the true Jaccard>=0.5 pairs (planted near-dups)") {
    val got = SparkEntry.queries("q35_dedup_minhash")(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    // Verification step guarantees precision = 1.0 by construction;
    // near-dups here are j≈0.99 where 16×8 banding recall ≈ 1.
    assert(got.subsetOf(bruteforcePairs), s"false positives: ${got -- bruteforcePairs}")
    assert(got === bruteforcePairs,
      s"missed: ${bruteforcePairs -- got} (recall ${got.size}/${bruteforcePairs.size})")
    assert(got.nonEmpty, "testdata plants ~25 near-dup pairs; found none")
  }

  test("q36 SimHash: reported pairs have hamming<=7 and include most near-identical pairs") {
    val got = SparkEntry.queries("q36_dedup_simhash")(spark, sf).collect()
    assert(got.forall(_.getAs[Int]("hamming") <= 7))
    val pairs = got.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    // SimHash is the weakest of the dedup family on SHORT docs (per-bit
    // margins ~sqrt(#shingles)); at hamming<=7 it should still catch
    // the clear majority of the j≈0.99 planted pairs.
    assert(bruteforcePairs.intersect(pairs).size >= (bruteforcePairs.size * 0.6).toInt,
      s"simhash found ${bruteforcePairs.intersect(pairs).size} of ${bruteforcePairs.size} planted pairs")
  }

  test("q37 n-gram Jaccard: all reported pairs verified >= 0.3; planted pairs found") {
    val got = SparkEntry.queries("q37_ngram_jaccard")(spark, sf).collect()
    assert(got.forall(_.getAs[Double]("jaccard") >= 0.3))
    val pairs = got.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(bruteforcePairs.forall(pairs.contains),
      "k-min blocking should catch all j>=0.5 pairs")
  }

  test("q38 embedding near-dup: precision 1.0 (every pair re-verified >= 0.4 cosine)") {
    val got = SparkEntry.queries("q38_dedup_embedding")(spark, sf).collect()
    assert(got.forall(_.getAs[Double]("cos") >= 0.4))
  }

  test("q34 exact dedup keeps one row per distinct text") {
    val n = SparkEntry.queries("q34_dedup_exact")(spark, sf).count()
    val distinctTexts = Tables.documents(spark, sf).select("text").distinct().count()
    assert(n === distinctTexts)
  }
}
