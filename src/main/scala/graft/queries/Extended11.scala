package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Tenth extension batch (SURVEY.md §2 q91–q92): grouping-id
  * disambiguation for subtotal rows and calendar-spine gap detection.
  */
object Extended11 {

  // ---------------------------------------------------------------- q91
  /** Rollup with `grouping()` markers: subtotal rows carry NULL in
    * the rolled-up column, indistinguishable from genuine NULL data —
    * `grouping(col)` is the standard disambiguator (1 = subtotal,
    * 0 = real group). Completes q24's rollup coverage; same one
    * partial-agg shuffle.
    */
  private def q91(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("total"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"))
      .orderBy(col("g_priority"), col("g_status"),
        col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  private val q91Sql =
    """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
      |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status
      |FROM orders
      |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      |ORDER BY g_priority, g_status,
      |         o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q92
  /** Calendar-spine gap detection: generate each user's full day
    * spine between their first and last event, anti-join observed
    * days, report missing-day counts — the completeness audit every
    * ingestion pipeline runs. The spine is a row-local `sequence`
    * explode off a tiny per-user aggregate; the anti-join shuffles
    * (user, day) pairs only.
    */
  private def q92(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val spans = days.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"),
        count(lit(1)).as("n_active_days"))
    val spine = spans.select(col("user_id"), col("n_active_days"),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    spine.join(days, Seq("user_id", "day"), "left_anti")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_missing_days"),
        min(col("day")).as("first_gap_day"))
      .orderBy("user_id")
  }

  private val q92Sql =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |spans AS (
      |  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM days GROUP BY 1),
      |spine AS (
      |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM spans),
      |missing AS (
      |  SELECT s.user_id, s.day FROM spine s
      |  LEFT JOIN days d ON s.user_id = d.user_id AND s.day = d.day
      |  WHERE d.user_id IS NULL)
      |SELECT user_id, COUNT(*) AS n_missing_days, MIN(day) AS first_gap_day
      |FROM missing GROUP BY user_id ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q91_rollup_grouping" -> (q91 _),
    "q92_date_spine"      -> (q92 _))

  val oracles: Map[String, String] = Map(
    "q91_rollup_grouping" -> q91Sql,
    "q92_date_spine"      -> q92Sql)
}
