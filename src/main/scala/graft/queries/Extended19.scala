package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eighteenth extension batch (SURVEY.md §2 q118): scalar int8
  * embedding quantization — the storage-compression step of a
  * large-scale embedding store (4× smaller than float32; IVF/brute
  * re-rank reads the int8 codes and rescales).
  */
object Extended19 {

  // --------------------------------------------------------------- q118
  /** Per-dimension min/max scalar quantization to uint8 codes.
    * Stats pass: posexplode → (dim, min, max) — a 64-row aggregate,
    * broadcast back. Quantize pass: row-local rescale + round per
    * dim, re-assembled in dim order. The corpus shuffles once for the
    * stats (partial-agg on 64 keys) and never again; codes ship as
    * JSON (array-typed result columns crash the driver comparator).
    * Rounding parity: both engines evaluate the identical double
    * expression ((x-min)/(max-min)*255) and HALF_UP-round it, so the
    * codes are bit-deterministic cross-engine.
    */
  private def q118(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val dims = emb
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(min(col("x").cast("double")).as("lo"),
        max(col("x").cast("double")).as("hi"))
    // The stats table is DIMENSION-sized (bounded by the embedding
    // width, not the corpus) — collect it once and apply the
    // quantization as a map-side indexed transform over the stored
    // array. The previous form re-exploded every vector into D rows,
    // joined the stats and re-grouped by vec_id to rebuild the array:
    // that second shuffle carried D rows PER VECTOR (plus a per-group
    // sort) — at 100 TB, the dominant exchange of the query, now gone
    // entirely. Same double expression and HALF_UP rounding, so the
    // codes stay bit-identical to the oracle's.
    val st = dims.orderBy("dim").collect()
    val lo = typedLit(st.map(_.getDouble(1)).toSeq)
    val hi = typedLit(st.map(_.getDouble(2)).toSeq)
    // Cardinality parity on degenerate rows: the oracle's unnest path
    // (and the old posexplode form) emits NO row for a null/empty
    // embedding, while a bare transform would keep it with null/"[]"
    // codes. size() is -1 for null, so one predicate covers both.
    emb
      .filter(size(col("embedding")) > 0)
      .select(col("vec_id"),
        to_json(transform(col("embedding"), (x, i) =>
          round((x.cast("double") - element_at(lo, i + 1)) /
              (element_at(hi, i + 1) - element_at(lo, i + 1)) * 255, 0)
            .cast("int"))).as("codes"))
      .orderBy("vec_id")
  }

  private val q118Sql =
    """WITH flat AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |stats AS (
      |  SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM flat GROUP BY dim),
      |coded AS (
      |  SELECT vec_id, f.dim,
      |         CAST(ROUND((x - lo) / (hi - lo) * 255, 0) AS INT) AS q
      |  FROM flat f JOIN stats s ON f.dim = s.dim)
      |SELECT vec_id,
      |       CAST(to_json(list(q ORDER BY dim)) AS VARCHAR) AS codes
      |FROM coded GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // --------------------------------------------------------------- q119
  /** Map higher-order functions as user operators: transform_values /
    * map_filter / map_zip_with over a per-order (linenumber → qty)
    * map (q69 covers construction/lookup; this is the lambda
    * surface). Quantities pre-aggregated per (order, linenumber) so
    * map keys are unique under ANSI's EXCEPTION dedup policy; maps
    * built from SORTED entry lists so entry order — which to_json
    * exposes — is deterministic on both engines.
    */
  private def q119(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"), col("l_linenumber").as("key"))
      .agg(sum(col("l_quantity").cast("int")).cast("int").as("value"))
    val m = base.groupBy("l_orderkey")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("key"), col("value"))))).as("qty_map"))
    m.select(col("l_orderkey"),
        to_json(map_entries(col("qty_map"))).as("qty_entries"),
        to_json(map_entries(
          transform_values(col("qty_map"), (_, v) => v * 2))).as("doubled"),
        to_json(map_entries(
          map_filter(col("qty_map"), (k, _) => k % 2 === 0))).as("evens"),
        to_json(map_entries(map_zip_with(
          col("qty_map"),
          transform_values(col("qty_map"), (_, v) => v * 2),
          (_, a, b) => a + b))).as("zipped"))
      .orderBy("l_orderkey")
  }

  private val q119Sql =
    """WITH base AS (
      |  SELECT l_orderkey, l_linenumber AS k,
      |         CAST(SUM(CAST(l_quantity AS INT)) AS INT) AS v
      |  FROM lineitem GROUP BY 1, 2),
      |m AS (
      |  SELECT l_orderkey, list({'key': k, 'value': v} ORDER BY k) AS entries
      |  FROM base GROUP BY l_orderkey)
      |SELECT l_orderkey,
      |  CAST(to_json(entries) AS VARCHAR) AS qty_entries,
      |  CAST(to_json(list_transform(entries,
      |       e -> {'key': e.key, 'value': e.value * 2})) AS VARCHAR) AS doubled,
      |  CAST(to_json(list_filter(entries, e -> e.key % 2 = 0)) AS VARCHAR) AS evens,
      |  CAST(to_json(list_transform(entries,
      |       e -> {'key': e.key, 'value': e.value * 3})) AS VARCHAR) AS zipped
      |FROM m ORDER BY l_orderkey""".stripMargin

  // --------------------------------------------------------------- q120
  /** Path-based JSON extraction (`get_json_object`) — the
    * semi-structured point-access API, complementing q67's
    * schema-declared `from_json` decode. Row-local, codegen'd,
    * scan-bound; the rollup shuffles one int key.
    */
  private def q120(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .withColumn("k_bucket", (col("k") % 10).cast("int"))
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("n"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      .orderBy("k_bucket")

  private val q120Sql =
    """SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) % 10 AS INT) AS k_bucket,
      |       COUNT(*) AS n,
      |       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
      |       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max
      |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q118_embed_quantize" -> (q118 _),
    "q119_map_hofs"       -> (q119 _),
    "q120_json_path"      -> (q120 _))

  val oracles: Map[String, String] = Map(
    "q118_embed_quantize" -> q118Sql,
    "q119_map_hofs"       -> q119Sql,
    "q120_json_path"      -> q120Sql)
}
