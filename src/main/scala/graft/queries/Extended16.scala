package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifteenth extension batch (SURVEY.md §2 q111–q112): the dedup
  * pipeline's APPLY and REPORT steps — the deduplicated corpus
  * materialization and the one-row pipeline summary.
  */
object Extended16 {

  /** Shared rule set: a doc is dropped if it is (a) a non-minimal
    * copy of an exact-duplicate text group, or (b) a non-keeper
    * member of a near-dup cluster (q102's labels, which cover the
    * ≥2-token docs exact dedup can miss nothing from — exact dups are
    * Jaccard-1 pairs — while exact dedup still catches 0/1-token
    * copies LSH never sees).
    */
  private def keptDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
    val exactKeep = docs
      .withColumn("min_id",
        min(col("doc_id")).over(Window.partitionBy(col("text"))))
      .filter(col("doc_id") === col("min_id"))
      .drop("min_id", "text")
    val dropNear = Extended14.clusterLabels(s, dir)
      .filter(col("id") =!= col("lbl"))
      .select(col("id").as("doc_id"))
    // the drop set is candidate-sized (near-dup rate, already
    // materialized as a leaf RDD) — broadcast it so the corpus side
    // of the anti-join never shuffles
    exactKeep.join(broadcast(dropNear), Seq("doc_id"), "left_anti")
  }

  // --------------------------------------------------------------- q111
  /** Deduplicated corpus materialization — what a pipeline actually
    * writes back out after q34/q35/q102 have reported. The corpus
    * shuffles once (exact-dup window on the content key; at 100 TB
    * group on xxhash64(content)); the near-dup drop set is
    * candidate-sized and anti-joins via broadcast.
    */
  private def q111(s: SparkSession, dir: String): DataFrame =
    keptDocs(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy("doc_id")

  private val dropCtes =
    s"""pairs AS (
       |${DedupQueries.gramJaccardPairsSql(2, 0.5)}
       |),
       |edges AS (
       |  SELECT a AS id, b AS nb FROM pairs
       |  UNION ALL
       |  SELECT b AS id, a AS nb FROM pairs),
       |walk(id, lbl) AS (
       |  SELECT DISTINCT id, id FROM edges
       |  UNION
       |  SELECT e.id, w.lbl FROM edges e JOIN walk w ON w.id = e.nb),
       |comp AS (SELECT id, MIN(lbl) AS cluster_id FROM walk GROUP BY id),
       |drop_near AS (SELECT id AS doc_id FROM comp WHERE id <> cluster_id),
       |exact_keep AS (
       |  SELECT doc_id, source, n_chars FROM (
       |    SELECT doc_id, source, n_chars,
       |           MIN(doc_id) OVER (PARTITION BY text) AS min_id
       |    FROM documents)
       |  WHERE doc_id = min_id)""".stripMargin

  private val q111Sql =
    s"""WITH RECURSIVE $dropCtes
       |SELECT doc_id, source, n_chars FROM exact_keep
       |WHERE doc_id NOT IN (SELECT doc_id FROM drop_near)
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q112
  /** One-row dedup pipeline report: corpus size, exact-dup copies,
    * verified near-dup pairs, cluster count, final kept count — the
    * numbers an operator checks before blessing a corpus build. All
    * five inputs are already-aggregated intermediates (each one row or
    * candidate-sized), combined with literal-tag cross joins.
    */
  private def q112(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val nTexts = docs.agg(countDistinct(col("text")).as("n_distinct_texts"))
    val nPairs = DedupQueries.nearDupPairs(s, dir)
      .agg(count(lit(1)).as("n_near_pairs"))
    val labels = Extended14.clusterLabels(s, dir)
    val nClusters = labels.agg(countDistinct(col("lbl")).as("n_clusters"))
    val nKept = keptDocs(s, dir).agg(count(lit(1)).as("n_kept"))
    nDocs.crossJoin(nTexts).crossJoin(nPairs)
      .crossJoin(nClusters).crossJoin(nKept)
      .select(col("n_docs"), col("n_distinct_texts"), col("n_near_pairs"),
        col("n_clusters"), col("n_kept"))
  }

  private val q112Sql =
    s"""WITH RECURSIVE $dropCtes
       |SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       |       (SELECT COUNT(DISTINCT text) FROM documents) AS n_distinct_texts,
       |       (SELECT COUNT(*) FROM pairs) AS n_near_pairs,
       |       (SELECT COUNT(DISTINCT cluster_id) FROM comp) AS n_clusters,
       |       (SELECT COUNT(*) FROM exact_keep
       |        WHERE doc_id NOT IN (SELECT doc_id FROM drop_near)) AS n_kept""".stripMargin

  // --------------------------------------------------------------- q137
  /** Incremental APPLY (r13, completing q136's daily-job story): the
    * kept rows for the increment shard alone — q111 restricted to
    * doc_id ≥ split, computed against the STANDING index (exact-key
    * probe + q136 pair probe + shard-internal CC), never re-pairing
    * the base corpus. See [[DedupQueries.incrementalApplyWith]]. The
    * oracle is the full-rerun kept set restricted to the shard, so
    * the driver's gate hash-checks the monotone-append theorem (a
    * shard doc's keep/drop decision never needs base-vs-base CC)
    * directly.
    */
  private def q137(s: SparkSession, dir: String): DataFrame =
    DedupQueries.incrementalApplyWith(
      DedupQueries.incrementalIndex(s, dir), dir,
      // share q136's memoized pair table — a cold q137 used to re-run
      // the whole incremental pair pipeline (r13 bench stage lists)
      pairsOverride = Some(DedupQueries.incrementalPairs(s, dir)))
      .orderBy("doc_id")

  private val q137Sql =
    s"""WITH RECURSIVE sp AS (SELECT MAX(doc_id) * 4 // 5 AS v FROM documents),
       |$dropCtes
       |SELECT doc_id, source, n_chars FROM exact_keep
       |WHERE doc_id NOT IN (SELECT doc_id FROM drop_near)
       |  AND doc_id >= (SELECT v FROM sp)
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q111_dedup_apply"  -> (q111 _),
    "q112_dedup_report" -> (q112 _),
    "q137_dedup_incr_apply" -> (q137 _))

  val oracles: Map[String, String] = Map(
    "q111_dedup_apply"  -> q111Sql,
    "q112_dedup_report" -> q112Sql,
    "q137_dedup_incr_apply" -> q137Sql)
}
