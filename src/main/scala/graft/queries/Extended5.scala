package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifth extension batch (SURVEY.md §2 q63–q65): three more everyday
  * training-data-pipeline operators — intra-document repetition
  * scoring, sensitive-pattern counting, and sequence packing. All
  * row-local or single-window; all DuckDB-oracled.
  */
object Extended5 {

  // ---------------------------------------------------------------- q63
  /** Intra-document repetition score: distinct-to-total word-2-gram
    * ratio (near 1 = diverse text, near 0 = loops/boilerplate — the
    * classic repetition quality gate). Pure row-local map over the
    * scan; the only shuffle is the final ORDER BY for the oracle.
    */
  private def q63(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), T.wordNGrams(col("toks"), 2).as("grams"))
      .select(col("doc_id"),
        size(col("grams")).as("n_grams"),
        size(array_distinct(col("grams"))).as("n_distinct"))
      .withColumn("repetition",
        round(lit(1.0) - col("n_distinct").cast("double") /
          col("n_grams").cast("double"), 6))
      .orderBy("doc_id")

  private val q63Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id,
      |         list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS g
      |  FROM toks WHERE len(t) >= 2)
      |SELECT doc_id,
      |       CAST(len(g) AS INT) AS n_grams,
      |       CAST(len(list_distinct(g)) AS INT) AS n_distinct,
      |       ROUND(1.0 - CAST(len(list_distinct(g)) AS DOUBLE) /
      |             CAST(len(g) AS DOUBLE), 6) AS repetition
      |FROM grams ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Sensitive-pattern counts per document — the scrubbing pre-pass:
    * how many email-shaped / url-shaped / long-digit-run tokens a doc
    * carries. Row-local regex counting (codegen'd), scan-bound at any
    * scale; the corpus-level rollup is a partial-agg shuffle of three
    * ints per source.
    */
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val UrlRe = "https?://[^ ]+"
  private val DigitRunRe = "[0-9]{6,}"

  private def q64(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), T.normText(col("text")).as("t"))
      .select(col("source"),
        size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).as("emails"),
        size(regexp_extract_all(col("t"), lit(UrlRe), lit(0))).as("urls"),
        size(regexp_extract_all(col("t"), lit(DigitRunRe), lit(0))).as("digit_runs"))
      .groupBy("source")
      .agg(sum(col("emails")).as("n_emails"),
        sum(col("urls")).as("n_urls"),
        sum(col("digit_runs")).as("n_digit_runs"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")

  private val q64Sql =
    s"""WITH t AS (SELECT source, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
       |           FROM documents)
       |SELECT source,
       |       CAST(SUM(len(regexp_extract_all(t, '$EmailRe'))) AS BIGINT) AS n_emails,
       |       CAST(SUM(len(regexp_extract_all(t, '$UrlRe'))) AS BIGINT) AS n_urls,
       |       CAST(SUM(len(regexp_extract_all(t, '$DigitRunRe'))) AS BIGINT) AS n_digit_runs,
       |       COUNT(*) AS n_docs
       |FROM t GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q65
  /** Sequence packing: assign documents to fixed-budget training
    * packs (2048 tokens) by running token cumsum in a deterministic
    * order within each source — `pack_id = floor((cumsum - n) /
    * budget)` gives each doc the pack its FIRST token lands in
    * (greedy streaming packing with split-over-boundary semantics,
    * the standard pretraining batcher). One window shuffle on
    * `source`; at 100 TB packing runs per partition/shard exactly
    * like this window, and pack boundaries never cross shards.
    */
  private val PackBudget = 2048

  private def q65(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        T.wsTokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col("n_tokens")) / lit(PackBudget)))
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("cum_tokens"), col("pack_id"))
      .orderBy("source", "doc_id")
  }

  private val q65Sql =
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |    CAST(CASE WHEN LENGTH(regexp_replace(TRIM(text), '\\s+', ' ', 'g')) = 0 THEN 0
       |         ELSE LENGTH(regexp_replace(TRIM(text), '\\s+', ' ', 'g'))
       |              - LENGTH(REPLACE(regexp_replace(TRIM(text), '\\s+', ' ', 'g'), ' ', '')) + 1
       |    END AS BIGINT) AS n_tokens
       |  FROM documents)
       |SELECT source, doc_id, n_tokens,
       |       CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
       |       CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |                           ROWS UNBOUNDED PRECEDING) - n_tokens)
       |                  / $PackBudget) AS BIGINT) AS pack_id
       |FROM t ORDER BY source, doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_repetition"   -> (q63 _),
    "q64_pattern_scan" -> (q64 _),
    "q65_seq_packing"  -> (q65 _))

  val oracles: Map[String, String] = Map(
    "q63_repetition"   -> q63Sql,
    "q64_pattern_scan" -> q64Sql,
    "q65_seq_packing"  -> q65Sql)
}
