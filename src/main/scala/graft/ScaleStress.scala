package graft

import graft.functions.{Hashing, TextFunctions => T}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible ×R scale-stress for the dedup blocking paths (the
  * round-4 ×8 runs were ad hoc; this pins them as a harness).
  *
  * Replicates the corpus R× with disjoint id ranges — every document
  * becomes an R-clique of exact copies, so ground truth is known
  * without an oracle: all C(R,2)·N same-base pairs MUST be recovered
  * (exact copies share every signature). At sf0.1 × 8 = 40k docs,
  * every 8-bit SimHash chunk bucket holds ~N/256 ≈ 156 > MaxBucket=64
  * members, so 100% of pairs travel the oversized-bucket re-block
  * path — the exact regime where the pre-round-5 cap silently dropped
  * every bucket (clique recall would have been 0, not 1).
  *
  * Run: `runMain graft.ScaleStress [sfDir] [replication]`
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rep = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // same rationale as DedupQueries.dedupSession: the dedup plans
      // manage skew/coalescing explicitly and AQE's final-plan event
      // loop has a measured deadlock race with explicit broadcasts
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val Base = 10000000L
    val docsX = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .crossJoin(spark.range(rep).select(col("id").as("r")))
      .select((col("doc_id") + col("r") * Base).as("doc_id"), col("text"))
    val shingled = docsX
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(T.wordNGrams(col("toks"), 2)).as("shingles"))
      .filter(size(col("shingles")) >= 1)
    val codes = Hashing.simHashes(shingled, "doc_id", "shingles")
      .select(col("doc_id"), col("simhash").as("sim"))
      .localCheckpoint()
    val n = codes.count()

    val t0 = System.nanoTime()
    val pairs = graft.queries.DedupQueries.simHashPairs(codes)
      .localCheckpoint()
    val nPairs = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9

    // ground truth: every same-base pair is an exact copy (Hamming 0)
    val cliquePairs = pairs
      .filter(col("a") % Base === col("b") % Base).count()
    val nBase = n / rep
    val want = nBase * rep * (rep - 1) / 2
    println(f"[stress] q36 simhash ×$rep: $n docs, $nPairs%,d pairs in $secs%.1f s")
    println(f"[stress] clique recall: $cliquePairs%,d / $want%,d " +
      f"(${100.0 * cliquePairs / want}%.2f%%)")
    assert(cliquePairs == want,
      s"oversized-bucket re-block lost ${want - cliquePairs} clique pairs")

    // q35 MinHash-LSH: same clique ground truth (exact copies share
    // every band key; the verify Jaccard is 1.0)
    val sh = shingled.localCheckpoint()
    val t1 = System.nanoTime()
    val mhPairs = graft.queries.DedupQueries.minHashPairs(sh).localCheckpoint()
    val nMh = mhPairs.count()
    val mhSecs = (System.nanoTime() - t1) / 1e9
    val mhClique = mhPairs.filter(col("a") % Base === col("b") % Base).count()
    println(f"[stress] q35 minhash ×$rep: $nMh%,d pairs in $mhSecs%.1f s")
    println(f"[stress] clique recall: $mhClique%,d / $want%,d " +
      f"(${100.0 * mhClique / want}%.2f%%)")
    assert(mhClique == want,
      s"minhash blocking lost ${want - mhClique} clique pairs")
    spark.stop()
  }
}
