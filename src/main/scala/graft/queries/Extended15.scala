package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourteenth extension batch (SURVEY.md §2 q109–q110): unigram
  * language-model quality scoring and the statistical aggregate
  * surface (corr / covariance / variance / skewness / kurtosis).
  */
object Extended15 {

  // --------------------------------------------------------------- q109
  /** Unigram LM quality score: each doc's mean negative log-probability
    * under the corpus's own unigram distribution — the cheap stand-in
    * for the LM-perplexity filter (CCNet/Gopher-style) every
    * training-data pipeline runs. High nll = rare-token-heavy docs
    * (gibberish, boilerplate codes); low = stopword soup.
    *
    * One explode pass feeds BOTH the vocab build and the scoring join:
    * vocab is a (term, count) aggregate — sublinear in the corpus
    * (Heaps' law) — broadcast back onto the token stream, then one
    * per-doc aggregate. Two compact-key shuffles total; the corpus
    * text itself never shuffles. At a scale where the full vocab
    * outgrows broadcast, frequency-floor it (rare terms get a floor
    * probability) or fall back to a shuffle join on term.
    */
  private def q109(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(T.tokens(col("text"))).as("term"))
    // vocab feeds TWO consumers (the scalar total and the scoring
    // broadcast): materialize the vocabulary-sized aggregate once or
    // the corpus-wide explode+count pipeline re-executes per consumer
    // (cf. q87's uni — same fix, measured there).
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val total = vocab.agg(sum(col("cnt")).as("total"))
    toks.join(broadcast(vocab), "term")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(col("cnt").cast("double") / col("total").cast("double"))), 4)
          .as("nll"))
      .orderBy("doc_id")
  }

  private val q109Sql =
    """WITH terms AS (
      |  SELECT doc_id,
      |         unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS term
      |  FROM documents),
      |vocab AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM vocab)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |       ROUND(AVG(-ln(CAST(cnt AS DOUBLE) / total)), 4) AS nll
      |FROM terms JOIN vocab USING (term), tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q110
  /** Statistical aggregates per group: correlation, sample covariance
    * and variance, skewness, kurtosis — the moment surface ibis
    * exposes. All are single-pass partial aggregates (each moment is a
    * sum of powers), so one shuffle on the group key.
    *
    * Cross-engine parity note: corr / covar_samp / var_samp share one
    * definition, but Spark's skewness/kurtosis are the POPULATION
    * (g1, excess g2) statistics while DuckDB's carry sample
    * bias-correction — the oracle converts DuckDB's values back to g1
    * and g2 explicitly rather than pretending the names match.
    */
  private def q110(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), col("value"),
        unix_timestamp(col("ts")).cast("double").as("epoch_s"),
        hour(col("ts")).cast("double").as("hr"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(corr(col("value"), col("epoch_s")), 6).as("corr_v_t"),
        round(covar_samp(col("value"), col("hr")), 6).as("covar_v_hr"),
        round(var_samp(col("value")), 6).as("var_v"),
        round(skewness(col("value")), 6).as("skew_v"),
        round(kurtosis(col("value")), 6).as("kurt_v"))
      .orderBy("event_type")

  /** Skewness/kurtosis computed from explicit population central
    * moments (g1, excess g2) — Spark's definition — instead of
    * DuckDB's bias-corrected sample statistics of the same name.
    * `FLOOR(epoch(ts))` matches Spark `unix_timestamp`'s whole-second
    * truncation (events carry sub-second precision).
    */
  private val q110Sql =
    """WITH mu AS (
      |  SELECT event_type, AVG(value) AS mu FROM events GROUP BY 1)
      |SELECT e.event_type, COUNT(*) AS n,
      |       ROUND(corr(value, FLOOR(epoch(ts))), 6) AS corr_v_t,
      |       ROUND(covar_samp(value, CAST(hour(ts) AS DOUBLE)), 6) AS covar_v_hr,
      |       ROUND(var_samp(value), 6) AS var_v,
      |       ROUND(AVG(POWER(value - mu, 3))
      |             / POWER(AVG(POWER(value - mu, 2)), 1.5), 6) AS skew_v,
      |       ROUND(AVG(POWER(value - mu, 4))
      |             / POWER(AVG(POWER(value - mu, 2)), 2) - 3.0, 6) AS kurt_v
      |FROM events e JOIN mu USING (event_type)
      |GROUP BY e.event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q109_unigram_logprob" -> (q109 _),
    "q110_stats_agg"       -> (q110 _))

  val oracles: Map[String, String] = Map(
    "q109_unigram_logprob" -> q109Sql,
    "q110_stats_agg"       -> q110Sql)
}
