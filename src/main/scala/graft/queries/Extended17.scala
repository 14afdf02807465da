package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sixteenth extension batch (SURVEY.md §2 q113–q114): pattern-span
  * extraction (the scrub pipeline's extraction counterpart to q64's
  * counting) and the SQL LATERAL correlated-subquery join.
  */
object Extended17 {

  // --------------------------------------------------------------- q113
  /** Pattern-span EXTRACTION: every match of each pattern as its own
    * row with a stable (doc, kind, ordinal) key — what a scrubber
    * consumes to replace/audit individual spans (q64 only counts).
    * Row-local `regexp_extract_all` + posexplode: scan-bound, the
    * exchange carries only matched spans. Patterns are unambiguous
    * letter-run regexes (identical leftmost-greedy semantics in every
    * engine, same parity class q64 proved for email/url/digit runs).
    */
  private val Patterns = Seq(
    "long_word" -> "[a-z]{7,}",
    "vowel_run" -> "[aeiou]{2,}")

  private def q113(s: SparkSession, dir: String): DataFrame = {
    // ONE scan, ONE normalization pass, every pattern extracted in the
    // same projection (r16, guide §1.2/§2.5): the per-pattern unionAll
    // re-scanned the corpus and re-ran the 3-regex normText chain per
    // branch, and the documents table ships as a single small file —
    // ≤4 scan splits — so the regex work ran near-serial (measured
    // 2.5 CPU-s on 4 tasks, 3.7 s wall at sf0.1). The narrow-scan
    // repartition spreads the regex stage across the session's cores;
    // at cluster scale a real corpus scan is already thousands of
    // splits and the branch never fires (cf. DedupQueries.fanOut).
    val t0 = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val target = s.sparkContext.defaultParallelism
    val t = (if (t0.rdd.getNumPartitions < target) t0.repartition(target)
             else t0)
      .select(col("doc_id"), T.normText(col("text")).as("t"))
    t.select(col("doc_id"),
        explode(array(Patterns.map { case (kind, re) =>
          struct(lit(kind).as("kind"),
            regexp_extract_all(col("t"), lit(re), lit(0)).as("l"))
        }: _*)).as("e"))
      .select(col("doc_id"), col("e.kind").as("kind"),
        posexplode(col("e.l")).as(Seq("match_idx", "matched")))
      .orderBy("doc_id", "kind", "match_idx")
  }

  private val q113Sql = {
    val branches = Patterns.map { case (kind, re) =>
      s"  SELECT doc_id, '$kind' AS kind, regexp_extract_all(t, '$re') AS l FROM t"
    }.mkString("\n  UNION ALL\n")
    s"""WITH t AS (
       |  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
       |  FROM documents),
       |ex AS (
       |$branches)
       |SELECT doc_id, kind,
       |       CAST(generate_subscripts(l, 1) - 1 AS INT) AS match_idx,
       |       unnest(l) AS matched
       |FROM ex WHERE len(l) > 0
       |ORDER BY doc_id, kind, match_idx""".stripMargin
  }

  // --------------------------------------------------------------- q114
  /** SQL LATERAL correlated subquery: per region, the top-2 nations by
    * customer count — the lateral form every SQL frontend lowers
    * per-row subqueries to. Catalyst decorrelates the lateral into a
    * join + `WindowGroupLimit`-style rank pruning; nothing executes
    * per-row. (DataFrame-native equivalent is q77's grouped top-k;
    * this covers the SQL-facade surface.)
    */
  private def q114(s: SparkSession, dir: String): DataFrame = {
    Tables.region(s, dir).createOrReplaceTempView("region_v")
    Tables.nation(s, dir).createOrReplaceTempView("nation_v")
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT r.r_name, t.n_name, t.n_custs
        |FROM region_v r,
        |LATERAL (
        |  SELECT n.n_name,
        |         (SELECT COUNT(*) FROM customer_v c
        |          WHERE c.c_nationkey = n.n_nationkey) AS n_custs
        |  FROM nation_v n WHERE n.n_regionkey = r.r_regionkey
        |  ORDER BY n_custs DESC, n.n_name LIMIT 2) t
        |ORDER BY r_name, n_name""".stripMargin)
  }

  private val q114Sql =
    """SELECT r.r_name, t.n_name, t.n_custs
      |FROM region r, LATERAL (
      |  SELECT n.n_name,
      |         (SELECT COUNT(*) FROM customer c
      |          WHERE c.c_nationkey = n.n_nationkey) AS n_custs
      |  FROM nation n WHERE n.n_regionkey = r.r_regionkey
      |  ORDER BY n_custs DESC, n.n_name LIMIT 2) t
      |ORDER BY r_name, n_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_pattern_extract" -> (q113 _),
    "q114_lateral"         -> (q114 _))

  val oracles: Map[String, String] = Map(
    "q113_pattern_extract" -> q113Sql,
    "q114_lateral"         -> q114Sql)
}
