package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Extended operator coverage (SURVEY.md §2 q43–q46): as-of join,
  * exact quantiles, extra string/date scalar functions.
  */
object Extended {

  // ---------------------------------------------------------------- q43
  /** AS-OF JOIN: for each 'purchase' event, the latest 'click' of the
    * same user at-or-before its timestamp. ('click', not the original
    * 'login': the testdata generator emits no login events at any SF,
    * so the login form matched nothing and the driver gate only ever
    * compared all-null right sides — found in r6; clicks match ~93%
    * of purchases, so the gate now exercises real matches AND real
    * null-pads.)
    *
    * Spark-first formulation: instead of a custom physical operator,
    * union the two tagged streams and take `last(click_ts) IGNORE
    * NULLS` over (user, time) — ONE shuffle on the key, sort within
    * partitions, no join at all. This is the classic scalable as-of
    * shape (an actual range-join would be quadratic in skewed keys).
    * Oracle: DuckDB's native ASOF JOIN — an independent semantic
    * check, not an echo of our plan.
    */
  private def q43(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("l_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val unioned = purchases
      .withColumn("l_ts", lit(null).cast("timestamp"))
      .select(col("user_id"), col("ts"), lit(1).as("is_p"),
        col("event_id"), col("value"), col("l_ts"))
      .unionAll(clicks.select(col("user_id"), col("l_ts").as("ts"),
        lit(0).as("is_p"), lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("value"), col("l_ts")))
    // order clicks before purchases at identical ts (is_p asc) so a
    // same-instant click is visible to the purchase (ASOF >= matches)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("is_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("last_click_ts", last(col("l_ts"), ignoreNulls = true).over(w))
      .filter(col("is_p") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value"), col("last_click_ts"))
      .orderBy("event_id")
  }

  private val q43Sql =
    """SELECT p.event_id, p.user_id, p.ts, p.value, l.ts AS last_click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') l
      |  ON p.user_id = l.user_id AND p.ts >= l.ts
      |ORDER BY p.event_id""".stripMargin

  // ---------------------------------------------------------------- q44
  /** Exact quantiles (linear interpolation — Spark `percentile` ≡
    * DuckDB `quantile_cont`), rounded to absorb interpolation-order
    * ULP differences. The approx sketch path (`approx_percentile`,
    * HLL) is spec-only: sketches can't hash-match across engines.
    */
  private def q44(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"))
      .orderBy("l_returnflag")

  private val q44Sql =
    """SELECT l_returnflag,
      |       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
      |       ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q45
  private def q45(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "^([A-Za-z]+)", 1).as("first_word"),
        translate(col("p_brand"), "#", "-").as("brand_tr"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
        rpad(col("p_brand"), 12, ".").as("brand_pad"),
        reverse(col("p_name")).as("name_rev"),
        split(col("p_type"), " ").getItem(0).as("type_head"),
        replace(col("p_name"), lit("a"), lit("@")).as("name_repl"))
      .orderBy("p_partkey")

  private val q45Sql =
    """SELECT p_partkey,
      |       COALESCE(regexp_extract(p_type, '^([A-Za-z]+)', 1), '') AS first_word,
      |       replace(p_brand, '#', '-') AS brand_tr,
      |       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
      |       rpad(p_brand, 12, '.') AS brand_pad,
      |       reverse(p_name) AS name_rev,
      |       string_split(p_type, ' ')[1] AS type_head,
      |       replace(p_name, 'a', '@') AS name_repl
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q46
  private def q46(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_ts"),
        date_trunc("quarter", col("o_orderdate")).as("quarter_start"),
        dayofweek(col("o_orderdate")).as("dow"),
        dayofyear(col("o_orderdate")).as("doy"),
        quarter(col("o_orderdate")).as("qtr"),
        to_date(col("o_orderdate")).as("order_date"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey")

  private val q46Sql =
    """SELECT o_orderkey,
      |       o_orderdate + INTERVAL 30 DAY AS due_ts,
      |       CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start,
      |       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
      |       CAST(dayofyear(o_orderdate) AS INT) AS doy,
      |       CAST(quarter(o_orderdate) AS INT) AS qtr,
      |       CAST(o_orderdate AS DATE) AS order_date,
      |       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_asof_join"   -> (q43 _),
    "q44_percentiles" -> (q44 _),
    "q45_string_extra" -> (q45 _),
    "q46_date_extra"  -> (q46 _))

  val oracles: Map[String, String] = Map(
    "q43_asof_join"   -> q43Sql,
    "q44_percentiles" -> q44Sql,
    "q45_string_extra" -> q45Sql,
    "q46_date_extra"  -> q46Sql)
}
