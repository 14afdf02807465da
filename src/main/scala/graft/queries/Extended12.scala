package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eleventh extension batch (SURVEY.md §2 q93–q97): broadcast band
  * (range) join, time-series forward fill, the remaining aggregate
  * surface (count_if / bool_and / bool_or / median / max_by / min_by),
  * the scalar math + bitwise function surface, and deterministic
  * per-source mixture sampling (domain reweighting).
  */
object Extended12 {

  // ---------------------------------------------------------------- q93
  /** Band (range) join: classify rows against an interval table with a
    * non-equi join. The band table is tiny and BROADCAST, so the plan
    * is a BroadcastNestedLoopJoin — a per-row scan of 4 intervals, no
    * shuffle of the fact side. At 100 TB the fact side stays a pure
    * scan; only ever broadcast the interval side. (For two LARGE
    * interval sets you'd bin the range axis into equi-join keys
    * first — the q38-style blocking trick on the time/price axis.)
    */
  private def q93(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("b1_900_925", 900.0, 925.0),
      ("b2_925_950", 925.0, 950.0),
      ("b3_950_975", 950.0, 975.0),
      ("b4_975_1000", 975.0, 1000.0)).toDF("band", "lo", "hi")
    Tables.part(s, dir).select(col("p_partkey"), col("p_retailprice"))
      .join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("p_retailprice")), 4).as("avg_price"),
        round(min(col("p_retailprice")), 2).as("min_price"),
        round(max(col("p_retailprice")), 2).as("max_price"))
      .orderBy("band")
  }

  private val q93Sql =
    """SELECT band, COUNT(*) AS n,
      |       ROUND(AVG(p_retailprice), 4) AS avg_price,
      |       ROUND(MIN(p_retailprice), 2) AS min_price,
      |       ROUND(MAX(p_retailprice), 2) AS max_price
      |FROM part
      |JOIN (VALUES ('b1_900_925', 900.0, 925.0),
      |             ('b2_925_950', 925.0, 950.0),
      |             ('b3_950_975', 950.0, 975.0),
      |             ('b4_975_1000', 975.0, 1000.0)) AS bands(band, lo, hi)
      |  ON p_retailprice >= lo AND p_retailprice < hi
      |GROUP BY band ORDER BY band""".stripMargin

  // ---------------------------------------------------------------- q94
  /** Time-series forward fill: treat 'view' events as gaps and carry
    * the last observed value forward per user (`last(..., ignoreNulls)`
    * over a running ROWS frame) — the gap-repair primitive for sensor /
    * metric streams. One shuffle on user_id, then a single Window pass;
    * leading gaps stay NULL on both engines.
    */
  private def q94(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "view", lit(null)).otherwise(col("value"))
          .as("v"))
      .select(col("event_id"), col("user_id"),
        round(last(col("v"), ignoreNulls = true).over(w), 2).as("filled"))
      .orderBy("event_id")
  }

  private val q94Sql =
    """SELECT event_id, user_id,
      |  ROUND(last_value(CASE WHEN event_type = 'view' THEN NULL ELSE value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS filled
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q95
  /** The remaining aggregate surface: count_if, bool_and/bool_or,
    * exact median, and max_by/min_by with a composite (value, id)
    * ordering key so ties are deterministic. All partial-aggregable
    * except median (one extra sort inside the group — swap for
    * approx_percentile at 100 TB); max_by/min_by keep ONE row of state
    * per group, the scalable argmax shape.
    */
  private def q95(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("count_if(value > 250)").as("n_big"),
        expr("bool_and(value >= 0)").as("all_nonneg"),
        expr("bool_or(value > 480)").as("any_huge"),
        round(expr("median(value)"), 4).as("med"),
        expr("max_by(user_id, struct(value, event_id))").as("top_user"),
        expr("min_by(user_id, struct(value, event_id))").as("bottom_user"))
      .orderBy("event_type")

  private val q95Sql =
    """WITH ranked AS (
      |  SELECT event_type, user_id,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY value DESC, event_id DESC) AS rmax,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY value ASC, event_id ASC) AS rmin
      |  FROM events),
      |aggs AS (
      |  SELECT event_type,
      |         CAST(count_if(value > 250) AS BIGINT) AS n_big,
      |         bool_and(value >= 0) AS all_nonneg,
      |         bool_or(value > 480) AS any_huge,
      |         ROUND(median(value), 4) AS med
      |  FROM events GROUP BY 1)
      |SELECT a.event_type, a.n_big, a.all_nonneg, a.any_huge, a.med,
      |       mx.user_id AS top_user, mn.user_id AS bottom_user
      |FROM aggs a
      |JOIN (SELECT event_type, user_id FROM ranked WHERE rmax = 1) mx USING (event_type)
      |JOIN (SELECT event_type, user_id FROM ranked WHERE rmin = 1) mn USING (event_type)
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q96
  /** Scalar math + bitwise surface: abs/sqrt/ln/log10/exp/power/sign/
    * floor/ceil/mod/greatest/least and &,|,^,<<,bit_count — all
    * codegen'd row-local expressions, scan-bound at any scale. Floats
    * rounded on both engines (ULP absorption, SURVEY §5).
    */
  private def q96(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        round(abs(col("value") - 250), 6).as("abs_c"),
        round(sqrt(col("value")), 6).as("sqrt_v"),
        round(log(col("value") + 1), 6).as("ln_v"),
        // +1 guards the testdata's occasional exact-0 value: LOG10(0)
        // is an error in ANSI engines (bit at sf0.1; sf0.01 never hit it)
        round(log10(col("value") + 1), 6).as("log10_v"),
        round(exp(col("value") / 500), 6).as("exp_v"),
        round(pow(col("value"), 2), 4).as("pow_v"),
        signum(col("value") - 250).cast("int").as("sign_c"),
        floor(col("value")).as("floor_v"),
        ceil(col("value")).as("ceil_v"),
        (col("event_id") % 7).as("mod_id"),
        round(greatest(col("value"), lit(250.0)), 2).as("gr_v"),
        round(least(col("value"), lit(250.0)), 2).as("ls_v"),
        col("event_id").bitwiseAND(lit(255L)).as("band_id"),
        col("event_id").bitwiseOR(lit(16L)).as("bor_id"),
        col("event_id").bitwiseXOR(lit(255L)).as("bxor_id"),
        shiftleft(col("event_id"), 2).as("shl_id"),
        bit_count(col("event_id")).as("bits_id"))
      .orderBy("event_id")

  private val q96Sql =
    """SELECT event_id,
      |  ROUND(ABS(value - 250), 6) AS abs_c,
      |  ROUND(SQRT(value), 6) AS sqrt_v,
      |  ROUND(LN(value + 1), 6) AS ln_v,
      |  ROUND(LOG10(value + 1), 6) AS log10_v,
      |  ROUND(EXP(value / 500), 6) AS exp_v,
      |  ROUND(POWER(value, 2), 4) AS pow_v,
      |  CAST(SIGN(value - 250) AS INT) AS sign_c,
      |  CAST(FLOOR(value) AS BIGINT) AS floor_v,
      |  CAST(CEIL(value) AS BIGINT) AS ceil_v,
      |  event_id % 7 AS mod_id,
      |  ROUND(GREATEST(value, 250.0), 2) AS gr_v,
      |  ROUND(LEAST(value, 250.0), 2) AS ls_v,
      |  event_id & 255 AS band_id,
      |  event_id | 16 AS bor_id,
      |  xor(event_id, 255) AS bxor_id,
      |  event_id << 2 AS shl_id,
      |  CAST(bit_count(event_id) AS INT) AS bits_id
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q97
  /** Dataset mixture sampling (domain reweighting): each source gets a
    * target keep-rate and rows are kept by a deterministic multiplicative
    * hash of the row id — row-local, re-shard-stable, no shuffle before
    * the per-source audit rollup. This is how a 100 TB pretraining mix
    * is actually cut: the keep decision must be a pure row function so
    * any executor can evaluate it independently, and the audit agg is
    * partial. Rates derive from the source index (cycle 20..84) so the
    * query is SF-independent.
    */
  private def q97(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        (lit(20) + lit(16) * (substring(col("source"), 4, 10).cast("int") % 5))
          .as("rate"))
      .withColumn("keep", pmod(col("doc_id") * lit(2654435761L), lit(100L)) < col("rate"))
      .groupBy(col("source"), col("rate"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("chars_kept"))
      .orderBy("source")

  private val q97Sql =
    """SELECT source,
      |       20 + 16 * (CAST(SUBSTR(source, 4) AS INT) % 5) AS rate,
      |       CAST(COUNT(*) AS BIGINT) AS n_total,
      |       CAST(SUM(CASE WHEN (doc_id * 2654435761) % 100 <
      |                          20 + 16 * (CAST(SUBSTR(source, 4) AS INT) % 5)
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       CAST(SUM(CASE WHEN (doc_id * 2654435761) % 100 <
      |                          20 + 16 * (CAST(SUBSTR(source, 4) AS INT) % 5)
      |                     THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q93_band_join"      -> (q93 _),
    "q94_forward_fill"   -> (q94 _),
    "q95_agg_extras"     -> (q95 _),
    "q96_math_funcs"     -> (q96 _),
    "q97_mixture_sample" -> (q97 _))

  val oracles: Map[String, String] = Map(
    "q93_band_join"      -> q93Sql,
    "q94_forward_fill"   -> q94Sql,
    "q95_agg_extras"     -> q95Sql,
    "q96_math_funcs"     -> q96Sql,
    "q97_mixture_sample" -> q97Sql)
}
