package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixth extension batch (SURVEY.md §2 q70–q74, q76): the remaining
  * everyday training-data-pipeline operators — benchmark
  * decontamination, PII redaction, deterministic train/val/test
  * splitting, minority-stratum oversampling, TF-IDF term scoring —
  * plus the window-navigation function family (first/last/nth value).
  * All DuckDB-oracled.
  */
object Extended7 {

  // ---------------------------------------------------------------- q70
  /** Benchmark decontamination: flag corpus documents sharing word
    * 3-grams with an eval/benchmark set (here: `doc_id % 97 == 0`, a
    * deterministic ~1% probe), reporting how many distinct grams each
    * document shares.
    *
    * Scale shape: the eval set is benchmark-sized (thousands of docs),
    * so its distinct gram set BROADCASTS; the corpus side is a pure
    * map-side explode feeding a broadcast hash join — the 100 TB scan
    * never shuffles its grams, and the only exchange is the
    * (contaminated-doc, count) aggregation, sized by the hit rate.
    * Runs in the dedup family's AQE-off session (same explicit-
    * broadcast pathology, see [[DedupQueries.dedupSession]]).
    */
  private def q70(s0: SparkSession, dir: String): DataFrame = {
    val s = DedupQueries.dedupSession(s0)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        array_distinct(T.wordNGrams(col("toks"), 3)).as("grams"))
    val isEval = pmod(col("doc_id"), lit(97)) === 0
    val evalGrams = docs.filter(isEval)
      .select(explode(col("grams")).as("gram")).distinct()
      .localCheckpoint() // leaf child for the broadcast (cf. dedup doc)
    docs.filter(!isEval)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(evalGrams), "gram")
      // grams are per-doc distinct, so COUNT(*) = distinct shared grams
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  private val q70Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(range(1, len(t) - 1),
      |           i -> array_to_string(t[i:i+2], ' '))) AS g
      |  FROM toks WHERE len(t) >= 3),
      |eg AS (SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 97 = 0),
      |cg AS (SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 97 <> 0)
      |SELECT doc_id, COUNT(*) AS n_shared
      |FROM cg JOIN eg USING (gram)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q71
  /** PII redaction — the scrub pass that q64 (pattern counts) audits
    * for: replace email-shaped, url-shaped, and long-digit-run spans
    * with typed placeholder tokens. Row-local `regexp_replace` chain
    * (codegen'd), scan-bound at any scale; replacement order is fixed
    * (email → url → digits) and mirrored in the oracle, so both
    * engines transform identically.
    */
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val UrlRe = "https?://[^ ]+"
  private val DigitRunRe = "[0-9]{6,}"

  private def q71(s: SparkSession, dir: String): DataFrame = {
    val norm = T.normText(col("text"))
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(norm, EmailRe, "<EMAIL>"),
          UrlRe, "<URL>"),
        DigitRunRe, "<NUM>")
    Tables.documents(s, dir)
      .select(col("doc_id"), redacted.as("redacted"),
        (length(norm) - length(redacted)).as("chars_removed"))
      .orderBy("doc_id")
  }

  private val q71Sql =
    s"""WITH t AS (SELECT doc_id,
       |                  regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
       |           FROM documents),
       |r AS (SELECT doc_id, norm,
       |             regexp_replace(
       |               regexp_replace(
       |                 regexp_replace(norm, '$EmailRe', '<EMAIL>', 'g'),
       |                 '$UrlRe', '<URL>', 'g'),
       |               '$DigitRunRe', '<NUM>', 'g') AS redacted
       |      FROM t)
       |SELECT doc_id, redacted,
       |       CAST(LENGTH(norm) - LENGTH(redacted) AS INT) AS chars_removed
       |FROM r ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q72
  /** Deterministic train/val/test split: a multiplicative-mixed hash
    * of the stable row key mod 1000 buckets → 80/10/10. Pure row-local
    * decision (reproducible across engines, runs, partitionings,
    * resumed jobs); the only shuffle is the 3-group rollup. At 100 TB
    * the assignment is free at scan time and the split is stable under
    * re-sharding — the property shuffled-file splits don't have.
    */
  private def q72(s: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(col("doc_id") * lit(2654435761L), lit(1000L))
    Tables.documents(s, dir)
      .withColumn("split",
        when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy("split")
  }

  private val q72Sql =
    """SELECT CASE WHEN (doc_id * 2654435761) % 1000 < 800 THEN 'train'
      |            WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'val'
      |            ELSE 'test' END AS split,
      |       COUNT(*) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS chars,
      |       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents GROUP BY split ORDER BY split""".stripMargin

  // ---------------------------------------------------------------- q73
  /** Minority-stratum oversampling: replicate documents of
    * underrepresented languages by a per-language factor
    * (explode over a generated 1..k sequence → one row per copy with
    * its copy index). Row-local expansion — no shuffle at all; at
    * 100 TB the write amplification is the sampling policy itself,
    * and the copy index gives downstream shuffling/packing a
    * deterministic discriminator.
    */
  private def q73(s: SparkSession, dir: String): DataFrame = {
    val factor = coalesce(
      element_at(typedLit(Map("zh" -> 3, "de" -> 2)), col("lang")), lit(1))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1), factor)).as("copy_idx"))
      .orderBy("doc_id", "copy_idx")
  }

  private val q73Sql =
    """SELECT doc_id, lang,
      |       CAST(unnest(generate_series(1,
      |         CASE lang WHEN 'zh' THEN 3 WHEN 'de' THEN 2 ELSE 1 END)) AS INT)
      |         AS copy_idx
      |FROM documents ORDER BY doc_id, copy_idx""".stripMargin

  // ---------------------------------------------------------------- q74
  /** TF-IDF term scoring: per-document term frequency, corpus
    * document frequency, emit terms with tf ≥ 6 and their
    * tf·ln(N/df) score. One pass over the corpus: explode →
    * map-side-combined (doc, term) aggregate → term-partitioned
    * COUNT window (the df) → broadcast of the scalar doc count. Two
    * shuffles total, both partial-agg/window on compact keys.
    */
  private def q74(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tf = docs
      .select(col("doc_id"), explode(T.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df as a COUNT window over the tf aggregate — NOT a second
    // aggregation branch, which would re-run the token explode over
    // the whole corpus (tf feeds both sides of a self-join otherwise)
    val withDf = tf.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("term")))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    withDf.filter(col("tf") >= 6)
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .as("tfidf"))
      .orderBy("doc_id", "term")
  }

  private val q74Sql =
    """WITH terms AS (
      |  SELECT doc_id,
      |         unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
      |wdf AS (SELECT doc_id, term, tf,
      |               COUNT(*) OVER (PARTITION BY term) AS df
      |        FROM tf),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents)
      |SELECT doc_id, term, tf, df,
      |       ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      |FROM wdf, n
      |WHERE tf >= 6
      |ORDER BY doc_id, term""".stripMargin

  // ---------------------------------------------------------------- q76
  /** Window navigation functions: first / last / nth value of each
    * user's event sequence attached to every event. One shuffle on the
    * partition key; all three share one full-frame window spec, so
    * they evaluate in a single Window pass.
    */
  private def q76(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        first(col("value")).over(w).as("first_v"),
        last(col("value")).over(w).as("last_v"),
        nth_value(col("value"), 2).over(w).as("second_v"))
      .orderBy("event_id")
  }

  private val q76Sql =
    """SELECT event_id, user_id, value,
      |       first_value(value) OVER w AS first_v,
      |       last_value(value) OVER w AS last_v,
      |       nth_value(value, 2) OVER w AS second_v
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_decontaminate" -> (q70 _),
    "q71_pii_redact"    -> (q71 _),
    "q72_train_split"   -> (q72 _),
    "q73_oversample"    -> (q73 _),
    "q74_tfidf"         -> (q74 _),
    "q76_window_nav"    -> (q76 _))

  val oracles: Map[String, String] = Map(
    "q70_decontaminate" -> q70Sql,
    "q71_pii_redact"    -> q71Sql,
    "q72_train_split"   -> q72Sql,
    "q73_oversample"    -> q73Sql,
    "q74_tfidf"         -> q74Sql,
    "q76_window_nav"    -> q76Sql)
}
