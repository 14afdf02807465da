package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ninth extension batch (SURVEY.md §2 q85–q86): shared-span
  * detection (substring-level dedup) and single-pass column
  * profiling.
  */
object Extended10 {

  // ---------------------------------------------------------------- q85
  /** Shared-span detection: 16-token spans appearing in more than one
    * document — the substring-dedup primitive that catches copied
    * paragraphs inside otherwise-distinct documents (doc-level
    * MinHash misses these below its Jaccard threshold). Explode the
    * per-doc DISTINCT span set, one partial-agg shuffle on the span,
    * keep spans with >1 distinct doc. At 100 TB the exchange carries
    * (span-hash, doc_id) pairs — in production you'd ship
    * `xxhash64(span)` instead of the text (collision-checked), same
    * plan; text here so the oracle can reproduce it.
    */
  private val SpanTokens = 16

  private def q85(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= SpanTokens)
      .select(col("doc_id"),
        explode(array_distinct(T.wordNGrams(col("toks"), SpanTokens)))
          .as("span"))
      .groupBy("span")
      // (span, doc_id) is UNIQUE by construction — array_distinct
      // dedupes each doc's span list before the explode — so
      // count(*) ≡ count(DISTINCT doc_id) here, and the plain count
      // skips the distinct-aggregate rewrite (an extra exchange +
      // aggregate over (span, doc_id) keys with no map-side count
      // reduction). At 100 TB the span stream dominates this query;
      // one aggregation stage instead of two is the difference.
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)
      .orderBy("span")

  private val q85Sql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS t
       |  FROM documents),
       |spans AS (
       |  SELECT doc_id,
       |         unnest(list_distinct(list_transform(range(1, len(t) - ${SpanTokens - 2}),
       |           i -> array_to_string(t[i:i+${SpanTokens - 1}], ' ')))) AS span
       |  FROM toks WHERE len(t) >= $SpanTokens)
       |SELECT span, COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS first_doc
       |FROM spans GROUP BY span HAVING COUNT(DISTINCT doc_id) > 1
       |ORDER BY span""".stripMargin

  // ---------------------------------------------------------------- q86
  /** Single-pass column profiling (the dataframe `describe` surface):
    * null count and exact distinct count per column of `events`, one
    * scan + one aggregate row unpivoted with `stack`. At 100 TB the
    * exact COUNT(DISTINCT) pairs become `approx_count_distinct`
    * sketches (mergeable map-side) — same plan, sketch instead of
    * exact; exact here so DuckDB reproduces it.
    */
  private def q86(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("event_id", "user_id", "event_type", "value")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"))
    }
    val stackExpr = cols.map(c => s"'$c', ${c}_nulls, ${c}_distinct")
      .mkString(s"stack(${cols.size}, ", ", ", ") as (column_name, n_nulls, n_distinct)")
    Tables.events(s, dir)
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(stackExpr))
      .orderBy("column_name")
  }

  private val q86Sql =
    """SELECT column_name, n_nulls, n_distinct FROM (
      |  SELECT 'event_id' AS column_name,
      |         CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |         COUNT(DISTINCT event_id) AS n_distinct FROM events
      |  UNION ALL
      |  SELECT 'user_id',
      |         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(DISTINCT user_id) FROM events
      |  UNION ALL
      |  SELECT 'event_type',
      |         CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(DISTINCT event_type) FROM events
      |  UNION ALL
      |  SELECT 'value',
      |         CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(DISTINCT value) FROM events)
      |ORDER BY column_name""".stripMargin

  // ---------------------------------------------------------------- q87
  /** PMI collocation scoring: pointwise mutual information of word
    * bigrams vs their unigram marginals — the corpus-statistics op
    * behind phrase mining and tokenizer-merge candidates. Two
    * corpus passes (unigram and bigram explosions have different
    * shapes), each a map-side-combined count; the unigram table is
    * vocabulary-sized and broadcast to the thresholded bigram table
    * (at 100 TB a many-million-row vocab still broadcasts in
    * hundreds of MB; beyond that, flip the two joins to shuffles on
    * the word key — same plan otherwise).
    */
  private def q87(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
    // `uni` feeds THREE consumers (two broadcasts with different
    // build keys — no exchange reuse — plus the total below):
    // materialize the vocabulary-sized table once or the corpus-wide
    // unigram explode re-runs per consumer. The token total is then
    // a vocab-sized Σc — NOT a third corpus explode (Σ_vocab c ≡
    // total tokens by construction).
    val uni = docs.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val n = uni.agg(sum(col("c")).as("n_tokens"))
    val bi = docs.filter(size(col("toks")) >= 2)
      .select(explode(T.wordNGrams(col("toks"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= 30)
      .withColumn("x", split(col("bigram"), " ")(0))
      .withColumn("y", split(col("bigram"), " ")(1))
    bi
      .join(broadcast(uni.select(col("tok").as("x"), col("c").as("c_x"))), "x")
      .join(broadcast(uni.select(col("tok").as("y"), col("c").as("c_y"))), "y")
      .crossJoin(broadcast(n))
      .select(col("bigram"), col("c_xy"), col("c_x"), col("c_y"),
        round(log(col("n_tokens").cast("double") * col("c_xy") /
          (col("c_x") * col("c_y"))), 6).as("pmi"))
      .orderBy("bigram")
  }

  private val q87Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
      |  FROM documents),
      |uni AS (SELECT unnest(t) AS tok FROM toks),
      |uc AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
      |n AS (SELECT COUNT(*) AS n_tokens FROM uni),
      |bc AS (
      |  SELECT unnest(list_transform(range(1, len(t)),
      |           i -> t[i] || ' ' || t[i+1])) AS bigram
      |  FROM toks WHERE len(t) >= 2),
      |bg AS (SELECT bigram, COUNT(*) AS c_xy FROM bc GROUP BY bigram
      |       HAVING COUNT(*) >= 30)
      |SELECT bigram, c_xy, cx.c AS c_x, cy.c AS c_y,
      |       ROUND(ln(CAST(n_tokens AS DOUBLE) * c_xy / (cx.c * cy.c)), 6)
      |         AS pmi
      |FROM bg
      |CROSS JOIN n
      |JOIN uc cx ON string_split(bigram, ' ')[1] = cx.tok
      |JOIN uc cy ON string_split(bigram, ' ')[2] = cy.tok
      |ORDER BY bigram""".stripMargin

  // ---------------------------------------------------------------- q88
  /** Schema-evolution union: merge two "shards" whose schemas drifted
    * (the older extract lacks a column) via `unionByName(
    * allowMissingColumns = true)` — name-based alignment with
    * null-fill, the everyday shard-merging op `UNION ALL`'s
    * positional semantics can't express. Row-local; the aggregate
    * after it is one partial-agg shuffle.
    */
  private def q88(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val old = orders.filter(year(col("o_orderdate")) <= 1997)
      .select(col("o_orderkey"), col("o_totalprice")) // pre-migration schema
    val neu = orders.filter(year(col("o_orderdate")) >= 1998)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    old.unionByName(neu, allowMissingColumns = true)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total"))
      .orderBy(col("o_orderpriority").asc_nulls_first)
  }

  private val q88Sql =
    """WITH u AS (
      |  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
      |  FROM orders WHERE year(o_orderdate) <= 1997
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, o_orderpriority
      |  FROM orders WHERE year(o_orderdate) >= 1998)
      |SELECT o_orderpriority, COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM u GROUP BY o_orderpriority
      |ORDER BY o_orderpriority NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q89
  /** Unpivot / melt: lineitem's three measure columns into long-form
    * (measure, value) rows via the native `unpivot` operator — the
    * inverse of q48's pivot and the wide→long reshape every metrics
    * pipeline needs. Row-local 3× expansion, then one partial-agg
    * shuffle on (returnflag, measure).
    */
  private def q89(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        variableColumnName = "measure",
        valueColumnName = "v")
      .groupBy("l_returnflag", "measure")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total"))
      .orderBy("l_returnflag", "measure")

  private val q89Sql =
    """WITH u AS (
      |  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS v FROM lineitem
      |  UNION ALL
      |  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem)
      |SELECT l_returnflag, measure, COUNT(*) AS n,
      |       CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM u GROUP BY l_returnflag, measure
      |ORDER BY l_returnflag, measure""".stripMargin

  // ---------------------------------------------------------------- q90
  /** The SQL facade: the engine's tables registered as views and a
    * correlated EXISTS + correlated scalar subquery run through
    * `spark.sql` — the declarative entry point (the reference drives
    * its engine through SQL-generating ibis). Catalyst decorrelates
    * both subqueries into joins (aggregate-then-join for the scalar,
    * semi-join for EXISTS) — no per-row re-execution at any scale.
    */
  private def q90(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c.c_custkey, c.c_name,
        |       CAST((SELECT COUNT(*) FROM orders_v o
        |             WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders
        |FROM customer_v c
        |WHERE EXISTS (SELECT 1 FROM orders_v o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |ORDER BY c.c_custkey""".stripMargin)
  }

  private val q90Sql =
    """SELECT c.c_custkey, c.c_name,
      |       (SELECT COUNT(*) FROM orders o
      |        WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 300000)
      |ORDER BY c.c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_shared_spans" -> (q85 _),
    "q86_profile"      -> (q86 _),
    "q87_collocations" -> (q87 _),
    "q88_union_by_name" -> (q88 _),
    "q89_unpivot"      -> (q89 _),
    "q90_sql_correlated" -> (q90 _))

  val oracles: Map[String, String] = Map(
    "q85_shared_spans" -> q85Sql,
    "q86_profile"      -> q86Sql,
    "q87_collocations" -> q87Sql,
    "q88_union_by_name" -> q88Sql,
    "q89_unpivot"      -> q89Sql,
    "q90_sql_correlated" -> q90Sql)
}
