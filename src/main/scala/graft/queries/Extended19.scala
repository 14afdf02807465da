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
    val coded = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .join(broadcast(dims), "dim")
      .select(col("vec_id"), col("dim"),
        round((col("x").cast("double") - col("lo")) / (col("hi") - col("lo")) * 255, 0)
          .cast("int").as("q"))
    coded
      .groupBy("vec_id")
      .agg(sort_array(collect_list(struct(col("dim"), col("q")))).as("dq"))
      .select(col("vec_id"),
        to_json(transform(col("dq"), x => x.getField("q"))).as("codes"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q118_embed_quantize" -> (q118 _))

  val oracles: Map[String, String] = Map(
    "q118_embed_quantize" -> q118Sql)
}
