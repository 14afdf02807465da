package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventh extension batch (SURVEY.md §2 q77–q79): per-group top-k,
  * corpus quantile bucketing, and distinct-on / keep-latest — the
  * remaining row-selection surfaces of the ibis dataframe API, plus
  * the length-balancing op a pretraining batcher runs before packing.
  */
object Extended8 {

  // ---------------------------------------------------------------- q77
  /** Per-group top-k: the 2 highest-value orders per priority class.
    * Expressed as a rank-filter so Spark plans a `WindowGroupLimit`:
    * each map task keeps only k rows per group BEFORE the shuffle, so
    * the exchange carries O(groups × k × tasks), not the table — the
    * at-scale shape of grouped top-k (same two-phase idea as q39's
    * global top-k, done for free by the optimizer).
    */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= 2)
      .orderBy("o_orderpriority", "rk")
  }

  private val q77Sql =
    """SELECT * FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |         CAST(row_number() OVER (PARTITION BY o_orderpriority
      |                ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
      |  FROM orders)
      |WHERE rk <= 2 ORDER BY o_orderpriority, rk""".stripMargin

  // ---------------------------------------------------------------- q78
  /** Corpus quantile bucketing: exact quartile thresholds of document
    * length, broadcast to every row, each doc assigned its quartile,
    * per-bucket rollup. The length-balancing pass before sequence
    * packing. Threshold computation is one tiny aggregate (at 100 TB
    * you'd swap in `approx_percentile` — same plan shape, sketch
    * mergeable map-side); assignment is row-local against the
    * broadcast scalar row; rollup is a 4-group partial agg.
    */
  private def q78(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val qs = docs.agg(
      expr("percentile(n_chars, array(0.25, 0.5, 0.75))").as("qs"))
      .select(col("qs")(0).as("q1"), col("qs")(1).as("q2"), col("qs")(2).as("q3"))
    docs.crossJoin(broadcast(qs))
      .withColumn("bucket",
        when(col("n_chars") <= col("q1"), "p00_25")
          .when(col("n_chars") <= col("q2"), "p25_50")
          .when(col("n_chars") <= col("q3"), "p50_75")
          .otherwise("p75_100"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("bucket")
  }

  private val q78Sql =
    """WITH q AS (
      |  SELECT quantile_cont(n_chars, 0.25) AS q1,
      |         quantile_cont(n_chars, 0.50) AS q2,
      |         quantile_cont(n_chars, 0.75) AS q3
      |  FROM documents)
      |SELECT CASE WHEN n_chars <= q1 THEN 'p00_25'
      |            WHEN n_chars <= q2 THEN 'p25_50'
      |            WHEN n_chars <= q3 THEN 'p50_75'
      |            ELSE 'p75_100' END AS bucket,
      |       COUNT(*) AS n_docs,
      |       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents, q
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q79
  /** Distinct-on / keep-latest: one row per (user, event_type) — the
    * newest event (CDC-style "current state" compaction; ibis
    * `distinct(on=..., keep=...)`). Rank-filter form again so the
    * shuffle is `WindowGroupLimit`-pruned to one row per group per
    * map task.
    */
  private def q79(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts"), col("value"),
        row_number().over(w).as("rk"))
      .filter(col("rk") === 1)
      .drop("rk")
      .orderBy("user_id", "event_type")
  }

  private val q79Sql =
    """SELECT user_id, event_type, event_id, ts, value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |              ORDER BY ts DESC, event_id DESC) AS rk
      |  FROM events)
      |WHERE rk = 1 ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- q80
  /** Per-label embedding centroids: element-wise mean over each
    * label's vectors — the class-centroid computation behind nearest-
    * centroid classification, IVF coarse init, and drift monitoring.
    * Shape: posexplode to (label, pos, v) scalars → partial-agg mean
    * per (label, pos). The shuffle carries labels × dims partial sums
    * per task — independent of corpus size; no vector ever crosses
    * the wire whole. Output is flat (label, pos) rows: deterministic,
    * array-free (driver-comparator-safe), and exactly what a
    * downstream broadcast join consumes.
    */
  private def q80(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round(avg(col("v")), 6).as("centroid"), count(lit(1)).as("n_vecs"))
      .orderBy("label", "pos")

  private val q80Sql =
    """SELECT label, CAST(i - 1 AS INT) AS pos,
      |       ROUND(AVG(embedding[i]), 6) AS centroid,
      |       COUNT(*) AS n_vecs
      |FROM embeddings, range(1, 65) t(i)
      |GROUP BY label, pos ORDER BY label, pos""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_grouped_topk" -> (q77 _),
    "q78_length_bucket" -> (q78 _),
    "q79_keep_latest"  -> (q79 _),
    "q80_label_centroid" -> (q80 _))

  val oracles: Map[String, String] = Map(
    "q77_grouped_topk" -> q77Sql,
    "q78_length_bucket" -> q78Sql,
    "q79_keep_latest"  -> q79Sql,
    "q80_label_centroid" -> q80Sql)
}
