package graft.queries

import graft.Tables
import graft.functions.{BottomKSample, CmsEstimate, TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Twentieth extension batch (SURVEY.md §2 q126–q127): deterministic
  * bounded per-group sampling via the native [[BottomKSample]]
  * aggregate — "keep k pseudorandom docs per source" in one
  * aggregation pass with k-bounded mergeable buffers (the exchange
  * carries ≤ k longs per partition-group, not the group's rows) —
  * and heavy-hitter token counts via a mergeable count-min sketch
  * probed with the native [[CmsEstimate]] scalar.
  *
  * q126 oracle: the hash is a wrapping 64-bit multiply by an odd
  * constant, so DuckDB replicates it exactly with HUGEINT modular
  * arithmetic and ranks with a window — same ids, same order,
  * hash-checked. q127 oracle: exact top tokens plus CMS error
  * contracts as hash-checked booleans (the q121/q122 pattern).
  */
object Extended21 {

  // --------------------------------------------------------------- q126
  private def q126(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val sample = GraftSqlBridge.column(
      BottomKSample(GraftSqlBridge.expression(col("doc_id")), 10)
        .toAggregateExpression())
    Tables.documents(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sample.as("ids"))
      // array columns ship as JSON strings (driver comparator contract)
      .select(col("source"), col("n_docs"), to_json(col("ids")).as("sample_ids"))
      .orderBy("source")
  }

  private val q126Sql =
    """WITH u AS (
      |  SELECT source, doc_id,
      |         (CAST(doc_id AS HUGEINT) * 11400714819323198485::HUGEINT)
      |           % 18446744073709551616::HUGEINT AS uh
      |  FROM documents),
      |h AS (
      |  SELECT source, doc_id,
      |         CAST(CASE WHEN uh >= 9223372036854775808::HUGEINT
      |              THEN uh - 18446744073709551616::HUGEINT
      |              ELSE uh END AS BIGINT) AS sh
      |  FROM u),
      |p AS (
      |  SELECT source, doc_id, sh,
      |         row_number() OVER (PARTITION BY source ORDER BY sh) AS rn
      |  FROM h),
      |c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
      |SELECT c.source, c.n_docs,
      |       CAST(to_json(list(p.doc_id ORDER BY p.sh)) AS VARCHAR) AS sample_ids
      |FROM p JOIN c ON p.source = c.source
      |WHERE p.rn <= 10
      |GROUP BY c.source, c.n_docs
      |ORDER BY c.source""".stripMargin

  // --------------------------------------------------------------- q127
  /** Heavy-hitter tokens via count-min sketch: the exact top-10 token
    * counts (ground truth both engines compute) next to CMS estimates
    * probed from ONE mergeable sketch. The aggregate builds a partial
    * sketch per partition and merges map-side — at 100 TB the
    * exchange carries fixed-size sketch bytes per partition instead
    * of a row per distinct token — and the estimates obey two
    * deterministic contracts (seeded sketch): CMS never
    * underestimates, and overestimates by at most ε·N with the
    * sketch's confidence (ε=0.0001 ⇒ slack ≈ N/10000; the planted
    * corpus has ~50k token instances at sf0.01, so slack ≈ 6 — tight
    * enough that a broken merge or probe flips the boolean).
    */
  private def q127(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val toks = Tables.documents(s, dir)
      .select(explode(T.tokens(col("text"))).as("tok"))
    val sketch = toks
      .agg(expr("count_min_sketch(tok, 0.0001d, 0.99d, 42)").as("sk"),
        count(lit(1)).as("n_toks"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(10)
    val est = GraftSqlBridge.column(CmsEstimate(
      GraftSqlBridge.expression(col("sk")),
      GraftSqlBridge.expression(col("tok"))))
    exact.crossJoin(broadcast(sketch))
      .select(col("tok"), col("n"), est.as("est"), col("n_toks"))
      .select(col("tok"), col("n"),
        (col("est") >= col("n")).as("no_underestimate"),
        (col("est") <= col("n") +
          ceil(col("n_toks") * 0.0001).cast("long")).as("within_eps"))
      .orderBy(col("n").desc, col("tok"))
  }

  private val q127Sql =
    """WITH toks AS (
      |  SELECT unnest(string_split(
      |           regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
      |           ' ')) AS tok
      |  FROM documents)
      |SELECT tok, COUNT(*) AS n,
      |       TRUE AS no_underestimate, TRUE AS within_eps
      |FROM toks GROUP BY tok
      |ORDER BY n DESC, tok LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q126_group_sample" -> (q126 _),
    "q127_heavy_hitters" -> (q127 _))

  val oracles: Map[String, String] = Map(
    "q126_group_sample" -> q126Sql,
    "q127_heavy_hitters" -> q127Sql)
}
