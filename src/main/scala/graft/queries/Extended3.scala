package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third extension batch (SURVEY.md §2 q53–q56): the remaining join
  * flavors (full outer, right outer), set operations beyond UNION ALL
  * (INTERSECT / EXCEPT), and explode/unnest as a first-class covered
  * operator.
  */
object Extended3 {

  // ---------------------------------------------------------------- q53
  /** FULL OUTER join: per-user click counts vs purchase counts — both
    * sides have exclusive keys, so every null-handling path is
    * exercised. Both inputs aggregate on the join key first, so the
    * join consumes hash-partitioned-by-key children (exchange reuse,
    * no extra shuffle) and the unmatched-row handling is the only new
    * work.
    */
  private def q53(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id").agg(count(lit(1)).as("n_clicks"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("n_purchases"))
    clicks.join(purchases, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
      .orderBy("user_id")
  }

  private val q53Sql =
    """WITH c AS (SELECT user_id, COUNT(*) AS n_clicks
      |           FROM events WHERE event_type = 'click' GROUP BY user_id),
      |     p AS (SELECT user_id, COUNT(*) AS n_purchases
      |           FROM events WHERE event_type = 'purchase' GROUP BY user_id)
      |SELECT COALESCE(c.user_id, p.user_id) AS user_id,
      |       COALESCE(n_clicks, 0) AS n_clicks,
      |       COALESCE(n_purchases, 0) AS n_purchases
      |FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q54
  /** RIGHT OUTER join: orders right-joined to customer, so customers
    * with zero orders survive with count 0 (`count(col)` skips the
    * null-extended rows). The preserved side is the small dimension;
    * at scale this runs as a shuffled join on the key — the point here
    * is the join-flavor surface, q08/q10 cover the broadcast shapes.
    */
  private def q54(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
    o.join(c, col("o_custkey") === col("c_custkey"), "right")
      .groupBy("c_custkey", "c_name")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")
  }

  private val q54Sql =
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
      |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q55
  /** Set operations: customers ordering in both 1995 and 1996
    * (INTERSECT) vs only in 1995 (EXCEPT), tagged and unioned. Both
    * ops are distinct-semantics in Spark and ANSI SQL alike.
    */
  private def q55(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def inYear(y: Int) =
      o.filter(year(col("o_orderdate")) === y).select("o_custkey")
    val both = inYear(1995).intersect(inYear(1996))
      .select(lit("both").as("tag"), col("o_custkey"))
    val only95 = inYear(1995).except(inYear(1996))
      .select(lit("only_1995").as("tag"), col("o_custkey"))
    both.unionAll(only95).orderBy("tag", "o_custkey")
  }

  private val q55Sql =
    """SELECT 'both' AS tag, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      |UNION ALL
      |SELECT 'only_1995' AS tag, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      |ORDER BY tag, o_custkey""".stripMargin

  // ---------------------------------------------------------------- q56
  /** explode/unnest as a covered operator: token explosion over the
    * documents table into a corpus term-frequency table. Generate →
    * aggregate with map-side partial combine; the shuffle carries
    * (token, partial count), not the exploded rows.
    */
  private def q56(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(T.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy("token")

  private val q56Sql =
    """SELECT token, COUNT(*) AS n FROM (
      |  SELECT unnest(string_split(
      |    regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS token
      |  FROM documents)
      |GROUP BY token ORDER BY token""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_join_full_outer" -> (q53 _),
    "q54_join_right"      -> (q54 _),
    "q55_set_ops"         -> (q55 _),
    "q56_explode"         -> (q56 _))

  val oracles: Map[String, String] = Map(
    "q53_join_full_outer" -> q53Sql,
    "q54_join_right"      -> q54Sql,
    "q55_set_ops"         -> q55Sql,
    "q56_explode"         -> q56Sql)
}
