package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth extension batch (SURVEY.md §2 q59–q61): ranking-window
  * variants, deterministic stratified sampling, and corpus-level
  * distribution statistics — the latter two are everyday operations
  * in a training-data pipeline (subsample a corpus by language /
  * source at controlled rates; audit the length distribution of what
  * survived filtering).
  */
object Extended4 {

  // ---------------------------------------------------------------- q59
  /** Ranking-window variants beyond q19/q21: ntile quartiles,
    * cumulative distribution and percent rank of order totals within
    * each priority class. One shuffle on the partition key; all three
    * functions share the same window spec, so they evaluate in a
    * single Window operator pass.
    */
  private def q59(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    // orders begin 1995-01-01 in every SF — two months of data keeps
    // the result real (the earlier 1992 cutoff matched ZERO rows, a
    // vacuously-green oracle)
    Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1995-03-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        round(cume_dist().over(w), 6).as("cdist"),
        round(percent_rank().over(w), 6).as("prank"))
      .orderBy("o_orderkey")
  }

  private val q59Sql =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |       CAST(ntile(4) OVER w AS INT) AS quartile,
      |       ROUND(cume_dist() OVER w, 6) AS cdist,
      |       ROUND(percent_rank() OVER w, 6) AS prank
      |FROM orders
      |WHERE o_orderdate < TIMESTAMP '1995-03-01'
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q60
  /** Deterministic stratified sampling: per-language sampling rates
    * over the documents table (downsample the dominant stratum, keep
    * the rest), keyed on `doc_id % 100` so the decision is a pure
    * row-local function — reproducible across engines, runs,
    * partitionings, and resumed jobs, and embarrassingly parallel at
    * 100 TB (no shuffle; the filter pushes to the scan). In
    * production the modulus runs on a uniform hash of a stable key
    * (`xxhash64(doc_id)`); plain mod here because the oracle engine
    * has no xxhash64, and testdata ids are already uniform.
    */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    val rate = typedLit(Map("en" -> 20, "de" -> 50, "fr" -> 50,
      "es" -> 50, "zh" -> 100))
    Tables.documents(s, dir)
      .withColumn("keep_pct",
        coalesce(element_at(rate, col("lang")), lit(100)))
      .filter(pmod(col("doc_id"), lit(100)) < col("keep_pct"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
      .orderBy("lang")
  }

  private val q60Sql =
    """SELECT lang, COUNT(*) AS n_kept,
      |       CAST(SUM(n_chars) AS BIGINT) AS chars_kept
      |FROM documents
      |WHERE doc_id % 100 <
      |  CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 50 WHEN 'fr' THEN 50
      |            WHEN 'es' THEN 50 WHEN 'zh' THEN 100 ELSE 100 END
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Corpus distribution audit: token-count histogram per source —
    * fixed-width buckets computed row-locally, then one partial-agg
    * shuffle on (source, bucket). The shape every filter-pipeline
    * report needs; at 100 TB the scan dominates and the aggregate
    * output is O(sources × buckets).
    */
  private def q61(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"),
        least(floor(T.wsTokenCount(col("text")) / 16), lit(7)).as("bucket"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "bucket")

  /** DuckDB mirror of TextFunctions.wsTokenCount (same replace trick
    * as TextQueries' oracles). */
  private val sqlWsCount =
    """CASE WHEN LENGTH(regexp_replace(TRIM(text), '\s+', ' ', 'g')) = 0 THEN 0
      |     ELSE LENGTH(regexp_replace(TRIM(text), '\s+', ' ', 'g'))
      |          - LENGTH(REPLACE(regexp_replace(TRIM(text), '\s+', ' ', 'g'), ' ', '')) + 1
      |END""".stripMargin

  private val q61Sql =
    s"""SELECT source,
       |       LEAST(CAST(FLOOR(($sqlWsCount) / 16) AS BIGINT), 7) AS bucket,
       |       COUNT(*) AS n_docs
       |FROM documents
       |GROUP BY source, bucket ORDER BY source, bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_window_rank_funcs" -> (q59 _),
    "q60_stratified_sample" -> (q60 _),
    "q61_corpus_stats"      -> (q61 _))

  val oracles: Map[String, String] = Map(
    "q59_window_rank_funcs" -> q59Sql,
    "q60_stratified_sample" -> q60Sql,
    "q61_corpus_stats"      -> q61Sql)
}
