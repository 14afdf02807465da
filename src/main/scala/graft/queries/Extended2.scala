package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Second extension batch (SURVEY.md §2 q48–q50): pivot, array/list
  * operations, cube grouping sets.
  */
object Extended2 {

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  // ---------------------------------------------------------------- q48
  /** Pivot (wide aggregation). Explicit value list keeps the output
    * schema static — required for both determinism and (at scale) for
    * avoiding the extra distinct-values job Spark otherwise runs.
    * Oracle: portable CASE-WHEN aggregation (same semantics).
    */
  private def q48(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(dsum(col("value")))
      .na.fill(0.0)
      .orderBy("user_id")

  private val q48Sql = {
    def c(t: String) =
      s"COALESCE(CAST(SUM(CAST(CASE WHEN event_type = '$t' THEN value END AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS $t"
    s"""SELECT user_id, ${c("click")}, ${c("view")}, ${c("purchase")},
       |       ${c("signup")}, ${c("error")}
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------- q49
  /** Array/list operations: build, sort, dedup, filter, index, size,
    * membership — plus sorted `collect_list` as the grouped-array agg
    * (sorted, because bare collect_list order is partition-dependent).
    * The array columns ship as their JSON encodings (string columns):
    * the scalar derivations (index/membership/size) are computed on
    * the arrays first, and array-typed result columns crash the
    * driver's pandas comparator.
    */
  private def q49(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(
        sort_array(collect_list(col("l_linenumber"))).as("line_numbers"),
        sort_array(collect_set(col("l_returnflag"))).as("flags"),
        count(lit(1)).cast("int").as("n_lines"))
      .select(
        col("l_orderkey"),
        to_json(col("line_numbers")).as("line_numbers"),
        to_json(col("flags")).as("flags"),
        col("n_lines"),
        element_at(col("line_numbers"), 1).as("first_line"),
        array_contains(col("flags"), "R").as("has_return"),
        size(col("flags")).as("n_flags"))
      .orderBy("l_orderkey")

  private val q49Sql =
    """SELECT l_orderkey,
      |       CAST(to_json(list_sort(list(l_linenumber))) AS VARCHAR) AS line_numbers,
      |       CAST(to_json(list_sort(list(DISTINCT l_returnflag))) AS VARCHAR) AS flags,
      |       CAST(COUNT(*) AS INT) AS n_lines,
      |       list_sort(list(l_linenumber))[1] AS first_line,
      |       list_contains(list(DISTINCT l_returnflag), 'R') AS has_return,
      |       CAST(LEN(list(DISTINCT l_returnflag)) AS INT) AS n_flags
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  // ---------------------------------------------------------------- q50
  private def q50(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))

  private val q50Sql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q52
  /** Sliding event-time windows (2 h length, 30 min slide): each event
    * lands in 4 overlapping windows. Oracle reconstructs Spark's
    * aligned window-start set arithmetically (starts ≡ 0 mod slide in
    * (ts-2h, ts]).
    */
  private def q52(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "2 hours", "30 minutes").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n"), col("total"))
      .orderBy("win_start", "event_type")

  private val q52Sql =
    """SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 1800) * 1800 - i * 1800) AS TIMESTAMP) AS win_start,
      |       event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events CROSS JOIN (SELECT UNNEST(range(4)) AS i)
      |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_pivot"  -> (q48 _),
    "q49_arrays" -> (q49 _),
    "q50_cube"   -> (q50 _),
    "q52_sliding_window" -> (q52 _))

  val oracles: Map[String, String] = Map(
    "q48_pivot"  -> q48Sql,
    "q49_arrays" -> q49Sql,
    "q50_cube"   -> q50Sql,
    "q52_sliding_window" -> q52Sql)
}
