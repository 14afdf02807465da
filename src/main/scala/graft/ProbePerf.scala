package graft

import graft.functions.{Hashing, TextFunctions => T}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the dedup pipelines (dev tool). */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val withShingles = docs
      .withColumn("toks", T.tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .withColumn("shingles", array_distinct(T.wordNGrams(col("toks"), 2)))
      .select(col("doc_id"), col("shingles"))

    time("shingles")(withShingles.count())
    time("shingles_explode")(
      withShingles.select(explode(col("shingles"))).count())
    val sigs = Hashing.minHashSignatures(withShingles, "doc_id", "shingles", 128)
    time("minhash_sigs")(sigs.count())
    val bands = sigs.select(col("doc_id"),
      posexplode(Hashing.bandKeys(col("sig"), 16, 8)).as(Seq("band", "key")))
    time("bands")(bands.count())
    val buckets = bands.groupBy("band", "key")
      .agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")).between(2, 64))
    time("buckets")(buckets.count())
    val cands = buckets.select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b")).distinct()
    time("cands")(cands.count())

    // --- simhash side
    val sims = Hashing.simHashes(withShingles, "doc_id", "shingles")
    time("simhashes")(sims.count())
    val chunks = sims.select(col("doc_id"), col("simhash").as("sim"),
      posexplode(Hashing.simHashChunks(col("simhash"))).as(Seq("chunk_idx", "chunk")))
    time("chunks")(chunks.count())
    time("chunk_histogram")(
      chunks.groupBy("chunk_idx", "chunk").count()
        .orderBy(desc("count")).limit(10)
        .collect().map { r =>
          System.err.println(s"  idx=${r.get(0)} chunk=${r.get(1)} n=${r.getLong(2)}")
          1L
        }.sum)
    val a = chunks.select(col("doc_id").as("a"), col("sim").as("sim_a"),
      col("chunk_idx"), col("chunk"))
    val b = chunks.select(col("doc_id").as("b"), col("sim").as("sim_b"),
      col("chunk_idx"), col("chunk"))
    val joined = a.join(b, Seq("chunk_idx", "chunk")).filter(col("a") < col("b"))
    time("chunk_join_pairs")(joined.count())

    for (i <- 1 to 5)
      time(s"q35_run$i")(SparkEntry.queries("q35_dedup_minhash")(spark, dir).count())
    spark.stop()
  }
}
