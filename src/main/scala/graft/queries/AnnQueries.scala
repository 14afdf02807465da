package graft.queries

import graft.Tables
import graft.functions.CosineSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search q39–q40 (SURVEY.md §2). Query set: the 10
  * vectors with vec_id < 10 (deterministic).
  */
object AnnQueries {

  val K = 10

  // ---------------------------------------------------------------- q39
  /** Brute-force cosine top-k — the exact baseline. Scale shape:
    * queries broadcast (small side), corpus streamed once; top-k is
    * two-phase (per-salt partial top-k, then final top-k) so no single
    * reducer ever sees more than k×salts rows per query — a global
    * sort-limit would shuffle the whole corpus to one partition per
    * query at 100 TB.
    */
  private def q39(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        CosineSim(col("embedding"), col("q_emb")).as("cos"))
    val salted = scored.withColumn("salt", pmod(col("neighbor_id"), lit(16)))
    val w1 = Window.partitionBy("query_id", "salt")
      .orderBy(col("cos").desc, col("neighbor_id"))
    val partial = salted
      .withColumn("prn", row_number().over(w1)).filter(col("prn") <= K)
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    partial
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank")
  }

  private val q39Sql =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
       |           FROM embeddings WHERE vec_id < 10),
       |pairs AS (
       |  SELECT q.query_id, v.vec_id AS neighbor_id,
       |         list_cosine_similarity(v.embedding, q.q_emb) AS cos
       |  FROM embeddings v CROSS JOIN q
       |  WHERE v.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |              ORDER BY cos DESC, neighbor_id) AS INT) AS rank
       |  FROM pairs)
       |SELECT query_id, neighbor_id, rank FROM ranked
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q40
  /** LSH-bucketed ANN: 4 tables × 6-bit hyperplane codes; candidates =
    * bucket collisions in any table; exact cosine re-rank of the
    * (small) candidate set. Recall vs q39 asserted in AnnSpec.
    * Rows-only: approximate results have no SQL oracle.
    *
    * The dedup across tables runs on (query_id, neighbor_id) id pairs
    * only — embeddings are re-attached after the distinct, so no
    * exchange ever carries vector payloads (at 100 TB a distinct over
    * embedding-carrying rows would shuffle the candidate vectors 4×).
    */
  private def q40(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val coded = emb.select(col("vec_id"),
      posexplode(Lsh.srpCodes(col("embedding"), tables = 4, bits = 6))
        .as(Seq("tbl", "code")))
    val queries = coded.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("tbl"), col("code"))
    val cands = coded.join(broadcast(queries), Seq("tbl", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val queryEmb = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    emb.withColumnRenamed("vec_id", "neighbor_id")
      .join(broadcast(cands), Seq("neighbor_id")) // corpus pruned by id set
      .join(broadcast(queryEmb), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        CosineSim(col("embedding"), col("q_emb")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_ann_brute" -> (q39 _),
    "q40_ann_lsh"   -> (q40 _))

  val oracles: Map[String, String] = Map(
    "q39_ann_brute" -> q39Sql)
}
