package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Twelfth extension batch (SURVEY.md §2 q99–q101): the last ibis
  * relational-surface gaps — explicit cross join, LIMIT/OFFSET
  * pagination with NULLS FIRST ordering, and UNION with distinct
  * semantics.
  */
object Extended13 {

  // ---------------------------------------------------------------- q99
  /** Explicit cross join (ibis `cross_join`): the region × nation
    * grid with a membership flag. Both sides are dims, so the product
    * is a BroadcastNestedLoopJoin over tiny inputs; a cross join with
    * a LARGE side only ever makes sense broadcast (grid expansion),
    * never shuffled — Catalyst picks exactly that here.
    */
  private def q99(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).select(col("r_regionkey"), col("r_name"))
      .crossJoin(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey")))
      .select(col("r_name"), col("n_name"),
        (col("n_regionkey") === col("r_regionkey")).as("is_member"))
      .orderBy("r_name", "n_name")

  private val q99Sql =
    """SELECT r_name, n_name, n_regionkey = r_regionkey AS is_member
      |FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin

  // --------------------------------------------------------------- q100
  /** Pagination (ibis `.limit(n, offset=m)`): a fully deterministic
    * multi-key sort (computed NULL column exercises NULLS FIRST, key
    * tiebreak makes page boundaries stable) → OFFSET 100 → LIMIT 50.
    * At scale a global sort is one range-partitioned shuffle; OFFSET
    * only materializes the first offset+limit rows per partition
    * (TakeOrderedAndProject), not the table.
    */
  private def q100(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("prio_or_null"),
        col("o_totalprice"))
      .orderBy(col("prio_or_null").asc_nulls_first,
        col("o_totalprice").desc, col("o_orderkey").asc)
      .offset(100)
      .limit(50)

  private val q100Sql =
    """SELECT o_orderkey,
      |       NULLIF(o_orderpriority, '3-MEDIUM') AS prio_or_null,
      |       o_totalprice
      |FROM orders
      |ORDER BY prio_or_null ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC
      |LIMIT 50 OFFSET 100""".stripMargin

  // --------------------------------------------------------------- q101
  /** UNION with distinct semantics (q13 covers UNION ALL; q55 covers
    * INTERSECT/EXCEPT): two overlapping customer selections merged
    * without duplicates. Spark plans union + distinct as one
    * partial-aggregated shuffle on the full row — the same shape as a
    * GROUP BY ALL COLUMNS, so it scales like any aggregation.
    */
  private def q101(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val big = c.filter(col("c_acctbal") > 7500)
      .select(col("c_custkey"), col("c_nationkey"))
    val inNation = c.filter(col("c_nationkey") < 5)
      .select(col("c_custkey"), col("c_nationkey"))
    big.union(inNation).distinct().orderBy("c_custkey")
  }

  private val q101Sql =
    """SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 7500
      |UNION
      |SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 5
      |ORDER BY c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q99_cross_join"     -> (q99 _),
    "q100_pagination"    -> (q100 _),
    "q101_union_distinct" -> (q101 _))

  val oracles: Map[String, String] = Map(
    "q99_cross_join"      -> q99Sql,
    "q100_pagination"     -> q100Sql,
    "q101_union_distinct" -> q101Sql)
}
