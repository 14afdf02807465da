package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Nineteenth extension batch (SURVEY.md §2 q121–q123): mergeable
  * approximate sketches as USER operators, and the inverted index —
  * the remaining "100 TB shapes" the surface talked about but never
  * exposed as queries.
  *
  * Sketch oracle design: a sketch estimate can never hash-match an
  * exact engine, so these queries return the EXACT answer plus
  * booleans asserting the sketch landed within its error contract.
  * Both engines agree on the exact columns; the booleans are TRUE in
  * the oracle, so a sketch regression (wrong rsd, broken merge) flips
  * a hash-checked value — a stronger gate than the previous
  * "spec-only" stance (the sketches are deterministic for fixed data,
  * so this is stable, and it is verified at sf0.001/0.01/0.1 by the
  * cross-SF sweep).
  */
object Extended20 {

  // --------------------------------------------------------------- q121
  /** Distinct-count sketches: HLL++ (`approx_count_distinct`) and the
    * mergeable DataSketches HLL (`hll_sketch_agg` → union → estimate).
    * The union path is the 100 TB story: per-partition (here
    * per-linestatus) sketches are a few KB each, union at the
    * coordinator replaces a full distinct shuffle — COUNT(DISTINCT)
    * shuffles every key exactly once, the sketch ships O(sketch) per
    * group instead. Booleans assert each estimate lands within its
    * error contract — 3×rsd (15%) for HLL++, whose rsd=0.05 is a
    * standard deviation, not a bound (one sf0.01 group sits at ~6%),
    * and 5% (~3σ at lgK=12) for the DataSketches estimates.
    * Deterministic on fixed data.
    */
  private def q121(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val direct = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_orderkey")).as("exact_orders"),
      approx_count_distinct(col("l_orderkey")).as("hllpp"),
      expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey, 12))").as("ds_est"))
    val unioned = li
      .groupBy("l_returnflag", "l_linestatus")
      .agg(expr("hll_sketch_agg(l_orderkey, 12)").as("sk"))
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("union_est"))
    def ok(est: String, tol: Double): org.apache.spark.sql.Column =
      abs(col(est) - col("exact_orders")) <=
        col("exact_orders").cast("double") * tol
    direct.join(unioned, "l_returnflag")
      .select(col("l_returnflag"), col("exact_orders"),
        ok("hllpp", 0.15).as("hllpp_ok"),
        ok("ds_est", 0.05).as("sketch_ok"),
        ok("union_est", 0.05).as("union_ok"))
      .orderBy("l_returnflag")
  }

  private val q121Sql =
    """SELECT l_returnflag,
      |       COUNT(DISTINCT l_orderkey) AS exact_orders,
      |       TRUE AS hllpp_ok, TRUE AS sketch_ok, TRUE AS union_ok
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------- q122
  /** Quantile sketch (`approx_percentile`, Greenwald–Khanna, accuracy
    * 1000 ⇒ rank error ≤ n/1000) next to the exact interpolated
    * percentile. At 100 TB the exact percentile needs a full sort per
    * group; the GK summary is a bounded-size mergeable state — this
    * is what q44's doc promised you'd "swap in" at scale, now an
    * operator with its contract hash-checked (booleans: sketch value
    * within 5% of exact; exact columns compared directly).
    */
  private def q122(s: SparkSession, dir: String): DataFrame = {
    def within(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      abs(a - b) <= abs(b) * 0.05
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.95)").as("e95"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").as("ap"))
      .select(col("l_returnflag"),
        round(col("e50"), 4).as("p50_exact"),
        round(col("e95"), 4).as("p95_exact"),
        within(element_at(col("ap"), 1), col("e50")).as("approx_p50_ok"),
        within(element_at(col("ap"), 2), col("e95")).as("approx_p95_ok"))
      .orderBy("l_returnflag")
  }

  private val q122Sql =
    """SELECT l_returnflag,
      |       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
      |       ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_exact,
      |       TRUE AS approx_p50_ok, TRUE AS approx_p95_ok
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------- q123
  /** Inverted index build: token → sorted posting list + document
    * frequency. One explode of per-doc DISTINCT tokens (so a token
    * counts once per doc), one shuffle keyed by token. Scale notes:
    * posting lists are the classic skew surface — head tokens
    * ("the") collect a posting per document. At 100 TB you cap or
    * tier them (store df + top-k postings for head terms, full lists
    * for the tail); the df computation itself is skew-safe (partial
    * counts map-side). Postings ship as JSON (array result columns
    * crash the driver comparator).
    */
  private def q123(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(T.tokens(col("text")))).as("token"))
      .filter(length(col("token")) >= 3)
      .groupBy("token")
      .agg(count(lit(1)).as("df"),
        to_json(sort_array(collect_set(col("doc_id")))).as("postings"))
      .filter(col("df") >= 2)
      .orderBy("token")

  private val q123Sql =
    """WITH pairs AS (
      |  SELECT DISTINCT doc_id,
      |         unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS token
      |  FROM documents)
      |SELECT token, COUNT(*) AS df,
      |       CAST(to_json(list(doc_id ORDER BY doc_id)) AS VARCHAR) AS postings
      |FROM pairs WHERE LENGTH(token) >= 3
      |GROUP BY token HAVING COUNT(*) >= 2 ORDER BY token""".stripMargin

  // --------------------------------------------------------------- q124
  /** The as-of join as a CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.AsofJoinExec]]): logical node → strategy → merge
    * scan, co-partitioned on the key, one forward pass per partition
    * with a single buffered row. Same semantics as q43 (which stays
    * the composed union+window formulation); same DuckDB native ASOF
    * oracle — so the custom operator is hash-checked against an
    * independent engine, not against q43.
    */
  private def q124(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("last_click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    graft.plans.AsofJoin
      .asof(purchases, clicks, key = "user_id",
        leftTime = "ts", rightTime = "last_click_ts")
      .orderBy("event_id")
  }

  private val q124Sql =
    """SELECT p.event_id, p.user_id, p.ts, p.value, l.ts AS last_click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') l
      |  ON p.user_id = l.user_id AND p.ts >= l.ts
      |ORDER BY p.event_id""".stripMargin

  // --------------------------------------------------------------- q128
  /** As-of join with a TOLERANCE (maximum lookback): the latest click
    * at-or-before each purchase counts only if it happened within the
    * last 24 h — older matches null-pad, the staleness cutoff every
    * real attribution/enrichment pipeline needs (pandas
    * `merge_asof(tolerance=...)`). Runs on the custom physical
    * operator ([[graft.plans.AsofJoinExec]]) whose merge applies the
    * cutoff to the single buffered candidate — exact, because the
    * LATEST at-or-before row is outside the window iff every
    * at-or-before row is. Same plan shape as q124: two exchanges, one
    * merge pass, no range join. Oracle: DuckDB native ASOF + the same
    * post-cutoff CASE — with the testdata's ~36 h median click→
    * purchase gap, the 24 h cutoff nulls roughly half the matches, so
    * the gate exercises both branches.
    */
  private def q128(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("last_click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    graft.plans.AsofJoin
      .asof(purchases, clicks, key = "user_id",
        leftTime = "ts", rightTime = "last_click_ts",
        toleranceUs = Some(24L * 3600 * 1000000)) // 24 h in µs
      .orderBy("event_id")
  }

  private val q128Sql =
    """SELECT p.event_id, p.user_id, p.ts, p.value,
      |       CASE WHEN l.ts >= p.ts - INTERVAL 24 HOUR THEN l.ts
      |            END AS last_click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') l
      |  ON p.user_id = l.user_id AND p.ts >= l.ts
      |ORDER BY p.event_id""".stripMargin

  // --------------------------------------------------------------- q130
  /** FORWARD as-of join with a look-AHEAD tolerance: each purchase
    * picks the user's EARLIEST click at-or-after it, kept only when it
    * lands within the next 24 h — "did the user come back?", the
    * mirror of q128's attribution lookback (pandas
    * `merge_asof(direction='forward', tolerance=...)`). Runs on
    * [[graft.plans.AsofJoin.asofForward]], which is exact time-negation
    * sugar over the custom merge operator — same two exchanges, one
    * merge pass per partition, tolerance applied to the single
    * buffered candidate. Oracle: DuckDB native ASOF with the
    * inequality flipped (`p.ts <= l.ts` picks earliest-at-or-after)
    * plus the same post-cutoff CASE. Median purchase→next-click gap in
    * the testdata is ~33 h, so the 24 h cutoff nulls roughly 60% of
    * matches — both branches exercised at the gate.
    */
  private def q130(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("next_click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    graft.plans.AsofJoin
      .asofForward(purchases, clicks, key = "user_id",
        leftTime = "ts", rightTime = "next_click_ts",
        toleranceUs = Some(24L * 3600 * 1000000)) // 24 h look-ahead in µs
      .orderBy("event_id")
  }

  private val q130Sql =
    """SELECT p.event_id, p.user_id, p.ts, p.value,
      |       CASE WHEN l.ts <= p.ts + INTERVAL 24 HOUR THEN l.ts
      |            END AS next_click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') l
      |  ON p.user_id = l.user_id AND p.ts <= l.ts
      |ORDER BY p.event_id""".stripMargin

  // --------------------------------------------------------------- q131
  /** NEAREST as-of join — the third `merge_asof` direction: each
    * purchase picks the click closest in time on EITHER side (ties →
    * backward, spec-pinned). Composed from the two native merges
    * (backward + forward, each the co-partitioned O(L+R) operator)
    * stitched on the unique `event_id`; the right payload is picked
    * column-wise from the nearer side. Oracle: DuckDB with BOTH native
    * ASOF directions chained and the same nearer-wins/backward-ties
    * CASE — a fully independent engine computing the same composition.
    */
  private def q131(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("near_click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    graft.plans.AsofJoin
      .asofNearest(purchases, clicks, key = "user_id",
        leftTime = "ts", rightTime = "near_click_ts", idCol = "event_id")
      .orderBy("event_id")
  }

  private val q131Sql =
    """SELECT p.event_id, p.user_id, p.ts, p.value,
      |       CASE WHEN b.ts IS NULL THEN f.ts
      |            WHEN f.ts IS NULL THEN b.ts
      |            WHEN p.ts - b.ts <= f.ts - p.ts THEN b.ts
      |            ELSE f.ts END AS near_click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      |  ON p.user_id = b.user_id AND p.ts >= b.ts
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') f
      |  ON p.user_id = f.user_id AND p.ts <= f.ts
      |ORDER BY p.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q121_sketch_distinct"  -> (q121 _),
    "q122_sketch_quantiles" -> (q122 _),
    "q123_inverted_index"   -> (q123 _),
    "q124_asof_native"      -> (q124 _),
    "q128_asof_tolerance"   -> (q128 _),
    "q130_asof_forward"     -> (q130 _),
    "q131_asof_nearest"     -> (q131 _))

  val oracles: Map[String, String] = Map(
    "q121_sketch_distinct"  -> q121Sql,
    "q122_sketch_quantiles" -> q122Sql,
    "q123_inverted_index"   -> q123Sql,
    "q124_asof_native"      -> q124Sql,
    "q128_asof_tolerance"   -> q128Sql,
    "q130_asof_forward"     -> q130Sql,
    "q131_asof_nearest"     -> q131Sql)
}
