package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + shape checks for the relational surface (q01–q27). Value
  * correctness is enforced by the DuckDB oracle gate (tools/
  * oracle_check.py rehearses it; the driver runs the real one).
  */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle-backed query has matching column names in its SQL") {
    // The driver's compare sorts columns by name — a rename on one side
    // is an automatic hash mismatch. Guard: every Spark output column
    // name must appear verbatim in the oracle SQL text.
    for ((name, sql) <- SparkEntry.oracleSql) {
      val df = SparkEntry.queries(name)(spark, sf)
      val missing = df.columns.filterNot(c => sql.contains(c))
      assert(missing.isEmpty,
        s"$name: Spark columns ${missing.mkString(",")} not present in oracle SQL")
    }
  }

  test("q04 TPC-H Q1 analog: 6 flag/status groups, positive sums") {
    val rows = SparkEntry.queries("q04_agg_group")(spark, sf).collect()
    assert(rows.length === 6)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
  }

  test("q20 flagship range window: per-event trailing sum >= own value") {
    val df = SparkEntry.queries("q20_window_range")(spark, sf)
    val bad = df.join(
      Tables.events(spark, sf).select(
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("value")),
      "event_id")
      .filter(org.apache.spark.sql.functions.col("pay_amount") <
        org.apache.spark.sql.functions.col("value") - 0.01)
    assert(bad.count() === 0)
  }

  test("q07 topk returns exactly 10 ordered rows") {
    val rows = SparkEntry.queries("q07_topk")(spark, sf).collect()
    assert(rows.length === 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("q12 anti join + q11 semi join partition the customer table") {
    val semi = SparkEntry.queries("q11_join_semi")(spark, sf).count()
    val anti = SparkEntry.queries("q12_join_anti")(spark, sf).count()
    val all = Tables.customer(spark, sf).count()
    assert(semi + anti === all)
  }
}
