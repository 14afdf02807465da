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

  // ---------------------------------------------------------------- q58
  /** Skew-mitigated aggregation over a deliberately hot key:
    * `event_type` has a handful of values over the whole events
    * table, so a naive exact-COUNT(DISTINCT)/heavy-state agg lands
    * each type's entire data on one reducer. Two skew templates:
    *
    *  - exact distinct users: pre-distinct on the COMPOSITE key
    *    (type, user) — that shuffle is spread across the cluster by
    *    the user dimension — then the per-type count aggregates a
    *    distinct-sized input;
    *  - salted two-phase sum/count: explicit 32-way salt on the first
    *    shuffle, merge partials on the bare key. (For algebraic aggs
    *    Spark's map-side partial agg already achieves this; the salt
    *    column is the template for non-algebraic per-key state —
    *    collect_list/UDAF buffers — where partial agg can't save you.)
    *
    * Exact-decimal sums so the salted merge is bit-equal to the
    * oracle's single-pass SUM.
    */
  private def q58(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
    val users = ev.select("event_type", "user_id").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n_users"))
    val salted = ev
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(32)))
      .groupBy(col("event_type"), col("salt"))
      .agg(sum(col("value").cast(DecimalType(18, 2))).as("ps"),
        count(lit(1)).as("pc"))
      .groupBy("event_type")
      .agg(sum(col("ps")).cast("double").as("total"), sum(col("pc")).as("n"))
    users.join(salted, Seq("event_type")).orderBy("event_type")
  }

  private val q58Sql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |       COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_join_full_outer" -> (q53 _),
    "q54_join_right"      -> (q54 _),
    "q55_set_ops"         -> (q55 _),
    "q56_explode"         -> (q56 _),
    "q58_skew_agg"        -> (q58 _))

  val oracles: Map[String, String] = Map(
    "q53_join_full_outer" -> q53Sql,
    "q54_join_right"      -> q54Sql,
    "q55_set_ops"         -> q55Sql,
    "q56_explode"         -> q56Sql,
    "q58_skew_agg"        -> q58Sql)
}
