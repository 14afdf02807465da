package graft.queries

import graft.Tables
import graft.functions.BottomKSample
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Twentieth extension batch (SURVEY.md §2 q126): deterministic
  * bounded per-group sampling via the native [[BottomKSample]]
  * aggregate — "keep k pseudorandom docs per source" in one
  * aggregation pass with k-bounded mergeable buffers (the exchange
  * carries ≤ k longs per partition-group, not the group's rows).
  *
  * Oracle: the hash is a wrapping 64-bit multiply by an odd constant,
  * so DuckDB replicates it exactly with HUGEINT modular arithmetic
  * and ranks with a window — same ids, same order, hash-checked.
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q126_group_sample" -> (q126 _))

  val oracles: Map[String, String] = Map(
    "q126_group_sample" -> q126Sql)
}
