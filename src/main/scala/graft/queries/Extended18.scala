package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventeenth extension batch (SURVEY.md §2 q115–q117): string
  * aggregation (ibis group_concat), bitwise aggregates, and
  * deterministic mode — the last aggregate-surface stragglers.
  */
object Extended18 {

  // --------------------------------------------------------------- q115
  /** String aggregation / group_concat: per region, its nations as one
    * ordered comma-joined string. Expressed as sorted `collect_list` +
    * `concat_ws` (order fixed BEFORE joining — a bare listagg is
    * partition-order-nondeterministic in any engine; DuckDB's oracle
    * uses string_agg ORDER BY for the same guarantee). The list is
    * group-bounded (dims), so the agg state stays small; for unbounded
    * groups you'd cap or bucket first.
    */
  private def q115(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        concat_ws(",", sort_array(collect_list(col("n_name"))))
          .as("nations"),
        count(lit(1)).cast("int").as("n_nations"))
      .orderBy("r_name")

  private val q115Sql =
    """SELECT r_name,
      |       string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |       CAST(COUNT(*) AS INT) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // --------------------------------------------------------------- q116
  /** Bitwise aggregates: AND/OR/XOR folds over a group — flag-mask
    * rollups (e.g. capability intersection/union over shards). All
    * three are one-pass partial aggregates.
    */
  private def q116(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        (col("event_id") % 256).as("flags"))
      .groupBy("event_type")
      .agg(bit_and(col("flags")).as("flags_and"),
        bit_or(col("flags")).as("flags_or"),
        bit_xor(col("flags")).as("flags_xor"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  private val q116Sql =
    """SELECT event_type,
      |       bit_and(event_id % 256) AS flags_and,
      |       bit_or(event_id % 256) AS flags_or,
      |       bit_xor(event_id % 256) AS flags_xor,
      |       COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- q117
  /** Deterministic MODE: the most frequent value per group, ties
    * broken toward the smaller value — two partial-agg shuffles
    * ((group, value) counts, then max_by on the (count, -value)
    * composite), never a sort of the table. Engines' built-in `mode`
    * leaves ties unspecified, so BOTH sides spell out the same
    * tie-break instead.
    */
  private def q117(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("int").as("qty"))
      .groupBy("l_returnflag", "qty")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("l_returnflag")
      .agg(
        max_by(col("qty"), struct(col("cnt"), (-col("qty")).as("nq")))
          .as("mode_qty"),
        max(col("cnt")).as("mode_count"))
      .orderBy("l_returnflag")

  private val q117Sql =
    """WITH c AS (
      |  SELECT l_returnflag, CAST(l_quantity AS INT) AS qty, COUNT(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (
      |  SELECT l_returnflag, qty, cnt,
      |         row_number() OVER (PARTITION BY l_returnflag
      |           ORDER BY cnt DESC, qty ASC) AS rn
      |  FROM c)
      |SELECT l_returnflag, qty AS mode_qty, cnt AS mode_count
      |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q115_string_agg" -> (q115 _),
    "q116_bit_agg"    -> (q116 _),
    "q117_mode"       -> (q117 _))

  val oracles: Map[String, String] = Map(
    "q115_string_agg" -> q115Sql,
    "q116_bit_agg"    -> q116Sql,
    "q117_mode"       -> q117Sql)
}
