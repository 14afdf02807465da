package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Sixth extension batch (SURVEY.md §2 q66–q67): the user-facing
  * array higher-order-function surface and schema'd JSON decode —
  * the last pieces of the ibis collection/semi-structured surface.
  */
object Extended6 {

  // ---------------------------------------------------------------- q66
  /** Array HOFs as user operators: per-order line-number array, then
    * transform / filter / exists / aggregate over it. Integer-typed
    * throughout so both engines agree bit-exactly; array results ship
    * as JSON strings (driver-comparator-safe, q49 convention). One
    * partial-agg shuffle builds the arrays; the HOFs are row-local.
    */
  private def q66(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(col("l_linenumber"))).as("lines"))
      .select(col("l_orderkey"),
        to_json(col("lines")).as("lines"),
        to_json(transform(col("lines"), x => x * 2)).as("doubled"),
        to_json(filter(col("lines"), x => x % 2 === 0)).as("evens"),
        exists(col("lines"), x => x >= 5).as("has_ge5"),
        aggregate(col("lines"), lit(0), (acc, x) => acc + x).as("line_sum"))
      .orderBy("l_orderkey")

  private val q66Sql =
    """WITH a AS (
      |  SELECT l_orderkey,
      |         list_sort(list(l_linenumber)) AS lines
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT l_orderkey,
      |       CAST(to_json(lines) AS VARCHAR) AS lines,
      |       CAST(to_json(list_transform(lines, x -> x * 2)) AS VARCHAR) AS doubled,
      |       CAST(to_json(list_filter(lines, x -> x % 2 = 0)) AS VARCHAR) AS evens,
      |       len(list_filter(lines, x -> x >= 5)) > 0 AS has_ge5,
      |       CAST(list_sum(lines) AS INT) AS line_sum
      |FROM a ORDER BY l_orderkey""".stripMargin

  // ---------------------------------------------------------------- q67
  /** Schema'd JSON decode (`from_json` into a typed struct — the same
    * decode the streaming source uses, as a batch operator) + grouped
    * stats over the decoded field. Decode is row-local codegen; the
    * rollup shuffles four ints per group.
    */
  private def q67(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(s, dir)
      .select(col("event_type"), from_json(col("props"), schema).as("p"))
      .groupBy("event_type")
      .agg(count(col("p.k")).as("n"),
        min(col("p.k")).as("k_min"),
        max(col("p.k")).as("k_max"),
        round(avg(col("p.k")), 6).as("k_avg"))
      .orderBy("event_type")
  }

  private val q67Sql =
    """SELECT event_type,
      |       COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n,
      |       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
      |       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max,
      |       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS k_avg
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q68
  /** Fuzzy matching via edit distance — the entity-resolution
    * primitive: customers whose name is within Levenshtein 3 of a
    * probe. Row-local DP (codegen'd `levenshtein`), scan-bound; at
    * scale a probe SET broadcasts and this is a broadcast nested-loop
    * over (candidate-blocked) rows — blocking via q35-style n-gram
    * LSH when both sides are large.
    */
  private val Probe = "Customer#000000100"

  private def q68(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"),
        levenshtein(col("c_name"), lit(Probe)).as("dist"))
      .filter(col("dist") <= 3)
      .orderBy("c_custkey")

  private val q68Sql =
    s"""SELECT c_custkey, c_name,
       |       CAST(levenshtein(c_name, '$Probe') AS INT) AS dist
       |FROM customer
       |WHERE levenshtein(c_name, '$Probe') <= 3
       |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q69
  /** Map-typed columns: build a per-order linenumber→quantity map
    * (`map_from_entries` over a sorted entry array, so key order is
    * deterministic), then cardinality / key lookup / keys / values.
    * The oracle computes the same RESULTS relationally — map
    * construction is engine-internal, so asserting the derived
    * scalars and sorted key/value lists is the dialect-safe check.
    */
  private def q69(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("int").as("qty"))
      // testdata linenumbers repeat within an order: dedup to one
      // entry per key (max qty) before map construction — map keys
      // must be unique (ANSI DUPLICATED_MAP_KEY otherwise)
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(max(col("qty")).as("qty"))
      .groupBy(col("l_orderkey"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("l_linenumber"), col("qty")))))
        .as("m"))
      .select(col("l_orderkey"),
        size(col("m")).as("n"),
        element_at(col("m"), 1).as("qty1"),
        to_json(map_keys(col("m"))).as("keys"),
        to_json(array_sort(map_values(col("m")))).as("vals_sorted"))
      .orderBy("l_orderkey")

  private val q69Sql =
    """WITH e AS (
      |  SELECT l_orderkey, l_linenumber, MAX(CAST(l_quantity AS INT)) AS qty
      |  FROM lineitem GROUP BY l_orderkey, l_linenumber)
      |SELECT l_orderkey,
      |       CAST(COUNT(*) AS INT) AS n,
      |       CAST(MAX(CASE WHEN l_linenumber = 1 THEN qty END) AS INT) AS qty1,
      |       CAST(to_json(list_sort(list(l_linenumber))) AS VARCHAR) AS keys,
      |       CAST(to_json(list_sort(list(qty))) AS VARCHAR) AS vals_sorted
      |FROM e GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_array_hofs"  -> (q66 _),
    "q67_json_decode" -> (q67 _),
    "q68_fuzzy_match" -> (q68 _),
    "q69_map_ops"     -> (q69 _))

  val oracles: Map[String, String] = Map(
    "q66_array_hofs"  -> q66Sql,
    "q67_json_decode" -> q67Sql,
    "q68_fuzzy_match" -> q68Sql,
    "q69_map_ops"     -> q69Sql)
}
