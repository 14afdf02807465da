package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Eighth extension batch (SURVEY.md §2 q81–q82): fixed-size token
  * chunking (the context-window splitter run before embedding /
  * retrieval indexing) and arbitrary-width time bucketing.
  */
object Extended9 {

  // ---------------------------------------------------------------- q81
  /** Context-window chunking: split each document's token stream into
    * fixed 32-token chunks (last chunk ragged), one output row per
    * chunk with its index, text, and token count. Row-local expansion
    * (explode over a computed chunk-index range + array slice) — no
    * shuffle but the final ORDER BY; at 100 TB this is the scan-bound
    * map stage feeding an embedding job, and the chunk index is the
    * stable join-back key.
    */
  private val ChunkTokens = 32

  private def q81(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
    toks
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          floor((size(col("toks")) - 1) / ChunkTokens).cast("int")))
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("toks"), col("chunk_idx") * ChunkTokens + 1, lit(ChunkTokens))
          .as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", col("chunk")).as("chunk_text"),
        size(col("chunk")).as("n_chunk_tokens"))
      .orderBy("doc_id", "chunk_idx")
  }

  private val q81Sql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS t
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, t,
       |         CAST(unnest(generate_series(0, (len(t) - 1) // $ChunkTokens)) AS INT)
       |           AS chunk_idx
       |  FROM toks WHERE len(t) >= 1)
       |SELECT doc_id, chunk_idx,
       |       array_to_string(
       |         t[chunk_idx * $ChunkTokens + 1 : chunk_idx * $ChunkTokens + $ChunkTokens],
       |         ' ') AS chunk_text,
       |       CAST(len(t[chunk_idx * $ChunkTokens + 1 : chunk_idx * $ChunkTokens + $ChunkTokens]) AS INT)
       |         AS n_chunk_tokens
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- q82
  /** Arbitrary-width time bucketing: 45-minute tumbling buckets via
    * `window()` (epoch-aligned — not expressible with date_trunc),
    * counted and exact-decimal-summed per (bucket, event_type). One
    * partial-agg shuffle; bucket assignment is row-local.
    */
  private def q82(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "45 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(col("win.start").as("bucket_start"), col("event_type"),
        col("n"), col("total"))
      .orderBy("bucket_start", "event_type")

  private val q82Sql =
    """SELECT time_bucket(INTERVAL '45 minutes', ts, TIMESTAMP '1970-01-01')
      |         AS bucket_start,
      |       event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events
      |GROUP BY bucket_start, event_type
      |ORDER BY bucket_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q83
  /** Numeric-RANGE window frame: for each order, how many orders of
    * the same priority fall within 1000.00 of its price, and their
    * exact-decimal sum — the value-based frame variant of q20's
    * time-based RANGE (the last window-frame flavor in the ibis
    * surface). One shuffle on the partition key. Prices are
    * 2-decimal; the 1000.00 bound lands on exact decimal values in
    * both engines, so frame membership is bit-identical.
    */
  private def q83(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"))
      .rangeBetween(-1000L, 0L)
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 7 === 0) // thin deterministically
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_near"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("near_total"))
      .orderBy("o_orderkey")
  }

  private val q83Sql =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |       COUNT(*) OVER w AS n_near,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |         AS near_total
      |FROM orders
      |WHERE o_orderkey % 7 = 0
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
      |             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q84
  /** Dynamic-gap session windows: the inactivity gap depends on the
    * event (clicks cool off in 10 min, views in 15, the rest in 30) —
    * the per-row-gap session semantics Flink-style engines expose.
    * `session_window(ts, CASE ...)` merges overlapping per-event
    * windows; end = max end of the merged set. One shuffle on the
    * session key. Oracle = running-max island formulation (a session
    * breaks exactly when an event's start reaches the max end of
    * everything before it).
    */
  private def q84(s: SparkSession, dir: String): DataFrame = {
    val gap = when(col("event_type") === "click", "10 minutes")
      .when(col("event_type") === "view", "15 minutes")
      .otherwise("30 minutes")
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("win"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(col("user_id"), col("win.start").as("session_start"),
        col("win.end").as("session_end"), col("n_events"), col("total"))
      .orderBy("user_id", "session_start")
  }

  private val q84Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, ts, value,
      |         ts + CASE event_type WHEN 'click' THEN INTERVAL 10 MINUTES
      |                              WHEN 'view' THEN INTERVAL 15 MINUTES
      |                              ELSE INTERVAL 30 MINUTES END AS win_end
      |  FROM events),
      |m AS (
      |  SELECT *, MAX(win_end) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |              AS prev_max_end
      |  FROM e),
      |f AS (SELECT *, CASE WHEN prev_max_end IS NULL OR ts >= prev_max_end
      |                     THEN 1 ELSE 0 END AS is_new FROM m),
      |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS UNBOUNDED PRECEDING) AS sid FROM f)
      |SELECT user_id, MIN(ts) AS session_start, MAX(win_end) AS session_end,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q81_chunking"    -> (q81 _),
    "q82_time_bucket" -> (q82 _),
    "q83_range_numeric" -> (q83 _),
    "q84_dynamic_session" -> (q84 _))

  val oracles: Map[String, String] = Map(
    "q81_chunking"    -> q81Sql,
    "q82_time_bucket" -> q82Sql,
    "q83_range_numeric" -> q83Sql,
    "q84_dynamic_session" -> q84Sql)
}
