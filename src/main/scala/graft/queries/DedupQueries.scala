package graft.queries

import graft.Tables
import graft.functions.{CosineSim, Hashing, TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family q34–q38 (SURVEY.md §2).
  *
  * Scale design: candidate generation always goes through an
  * exact-match blocking key (LSH band / SimHash chunk / hyperplane
  * bucket) so the only shuffle is a hash join on small keys — never an
  * all-pairs comparison. Oversized buckets are capped (identical-text
  * floods degrade to exact dedup, which q34 already handles).
  */
object DedupQueries {

  /** Max docs in one LSH bucket before it's dropped as degenerate
    * (exact-dup flood → q34's job; protects the pair join from
    * quadratic blowup and shuffle skew at scale).
    */
  val MaxBucket = 64

  // ---------------------------------------------------------------- q34
  /** Exact content dedup: canonical text → keeper (min doc_id) + copy
    * count. At 100 TB you group on xxhash64(content) instead of the
    * content itself (collision-checked); grouped-by-text here so the
    * DuckDB oracle can replicate byte-for-byte.
    */
  private def q34(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), length(col("text")).as("text_len"))
      .orderBy("keep_id")

  private val q34Sql =
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
      |       CAST(LENGTH(text) AS INT) AS text_len
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  // ---------------------------------------------------------------- q35
  /** MinHash(128) + LSH(16 bands × 8 rows) near-dup pairs, verified
    * with exact Jaccard ≥ 0.5 on word-2-shingle sets.
    *
    * Pipeline: per-doc signature (codegen, no shuffle) → explode the
    * 16 band keys only → self-join on (band, key) → distinct pairs →
    * verify with exact Jaccard. Band-key join input carries just
    * (doc_id, band, key) — at 100 TB the text never shuffles; the
    * verify join fetches shingle sets for the (tiny) candidate set.
    */
  private def q35(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val withShingles = docs
      .withColumn("toks", T.tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .withColumn("shingles", array_distinct(T.wordNGrams(col("toks"), 2)))
      .select(col("doc_id"), col("shingles"))
    val sigs = Hashing.minHashSignatures(withShingles, "doc_id", "shingles", 128)
      .select(col("doc_id"),
        posexplode(Hashing.bandKeys(col("sig"), bands = 16, rows = 8))
          .as(Seq("band", "key")))
    val buckets = sigs
      .groupBy("band", "key").agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")).between(2, MaxBucket))
    val cands = buckets
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    // shuffle_hash (not broadcast): broadcast builds the relation
    // single-threaded on the DRIVER — a bottleneck we measured (minutes
    // of idle executors in long sessions) and a known scale hazard;
    // the shuffled hash join keeps the build distributed.
    val sa = withShingles.select(col("doc_id").as("a"), col("shingles").as("sh_a"))
    val sb = withShingles.select(col("doc_id").as("b"), col("shingles").as("sh_b"))
    cands.join(sa.hint("shuffle_hash"), "a").join(sb.hint("shuffle_hash"), "b")
      .select(col("a"), col("b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy("a", "b")
  }

  // ---------------------------------------------------------------- q36
  /** SimHash near-dup: 64-bit code per doc, Hamming ≤ 7 via 8×8-bit
    * chunk blocking (pigeonhole-exact: no candidate at distance ≤7 is
    * missed) + `bit_count(xor)` verify.
    */
  private def q36(s: SparkSession, dir: String): DataFrame = {
    val shingled = Tables.documents(s, dir)
      .select(col("doc_id"),
        array_distinct(T.wordNGrams(T.tokens(col("text")), 2)).as("shingles"))
      .filter(size(col("shingles")) >= 1)
    val docs = Hashing.simHashes(shingled, "doc_id", "shingles")
      .select(col("doc_id"), col("simhash").as("sim"))
    val chunks = docs.select(col("doc_id"), col("sim"),
      posexplode(Hashing.simHashChunks(col("sim"))).as(Seq("chunk_idx", "chunk")))
    val a = chunks.select(col("doc_id").as("a"), col("sim").as("sim_a"),
      col("chunk_idx"), col("chunk"))
    val b = chunks.select(col("doc_id").as("b"), col("sim").as("sim_b"),
      col("chunk_idx"), col("chunk"))
    a.join(b.hint("shuffle_hash"), Seq("chunk_idx", "chunk")) // see q35 note
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        Hashing.hamming64(col("sim_a"), col("sim_b")).as("hamming"))
      .filter(col("hamming") <= 7) // cut candidates BEFORE the distinct shuffle
      .distinct()
      .orderBy("a", "b")
  }

  // ---------------------------------------------------------------- q37
  /** Word-3-gram Jaccard similarity join, blocked on shared k-min
    * shingle hashes (two docs with Jaccard j share the global min hash
    * with prob j; using the k=4 smallest boosts recall to
    * ~1-(1-j)^4 while keeping candidate generation an equi-join).
    */
  private def q37(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .withColumn("toks", T.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("grams", array_distinct(T.wordNGrams(col("toks"), 3)))
      .select(col("doc_id"), col("grams"))
    val keyed = docs.select(col("doc_id"), col("grams"),
      explode(Hashing.kMinSketch(
        Hashing.shingleHashes(col("grams")), 4)).as("minkey"))
    val a = keyed.select(col("doc_id").as("a"), col("grams").as("g_a"), col("minkey"))
    val b = keyed.select(col("doc_id").as("b"), col("grams").as("g_b"), col("minkey"))
    a.join(b.hint("shuffle_hash"), "minkey") // see q35 note
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))).cast("double"))
          .as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= 0.3)
      .orderBy("a", "b")
  }

  // ---------------------------------------------------------------- q38
  /** Embedding cosine near-dup via random-hyperplane LSH blocking
    * (8 hyperplanes × 8 tables) + exact cosine ≥ 0.4 verify with the
    * native CosineSim expression. Hyperplanes are seeded-deterministic.
    */
  private def q38(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val coded = emb.select(col("vec_id"), col("embedding"),
      posexplode(Lsh.srpCodes(col("embedding"), tables = 8, bits = 8))
        .as(Seq("tbl", "code")))
      .select(col("vec_id"), col("embedding"), col("tbl"), col("code"))
    val a = coded.select(col("vec_id").as("a"), col("embedding").as("e_a"),
      col("tbl"), col("code"))
    val b = coded.select(col("vec_id").as("b"), col("embedding").as("e_b"),
      col("tbl"), col("code"))
    a.join(b.hint("shuffle_hash"), Seq("tbl", "code")) // see q35 note
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), CosineSim(col("e_a"), col("e_b")).as("cos"))
      .distinct()
      .filter(col("cos") >= 0.4)
      .orderBy("a", "b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_dedup_exact"     -> (q34 _),
    "q35_dedup_minhash"   -> (q35 _),
    "q36_dedup_simhash"   -> (q36 _),
    "q37_ngram_jaccard"   -> (q37 _),
    "q38_dedup_embedding" -> (q38 _))

  val oracles: Map[String, String] = Map(
    "q34_dedup_exact" -> q34Sql)
}
