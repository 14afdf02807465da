package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for q93–q98 (oracle hashes are the primary gate). */
class Extended12Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("q93 band join classifies every part exactly once") {
    val out = SparkEntry.queries("q93_band_join")(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == Tables.part(spark, sf).count())
    // bands partition [900, 1000): min/max of each band stay in range
    out.foreach { r =>
      assert(r.getDouble(3) >= 900.0 && r.getDouble(4) < 1000.0)
    }
  }

  test("q93 plan broadcasts the band table (no fact-side shuffle)") {
    val plan = SparkEntry.queries("q93_band_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q94 forward fill carries the last non-gap value") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Long.MinValue, 0)
    // authored micro-case: gap rows take the previous value, leading
    // gaps stay null
    val rows = Seq(
      (1L, 1L, 1L, "x", 10.0), (2L, 1L, 2L, "view", 99.0),
      (3L, 1L, 3L, "view", 99.0), (4L, 1L, 4L, "x", 7.0),
      (5L, 2L, 1L, "view", 5.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val filled = rows
      .select(col("event_id"),
        last(when(col("event_type") === "view", lit(null))
          .otherwise(col("value")), ignoreNulls = true).over(w).as("filled"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(filled(2L).contains(10.0) && filled(3L).contains(10.0))
    assert(filled(4L).contains(7.0))
    assert(filled(5L).isEmpty)
  }

  test("q95 max_by/min_by match a window-rank formulation") {
    val out = SparkEntry.queries("q95_agg_extras")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(5), r.getLong(6))).toMap
    val byRank = Tables.events(spark, sf)
      .withColumn("rmax", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")
          .orderBy(col("value").desc, col("event_id").desc)))
      .filter(col("rmax") === 1)
      .select("event_type", "user_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byRank.foreach { case (et, top) => assert(out(et)._1 == top) }
  }

  test("q97 mixture keep-rule is stable under re-sharding") {
    val a = SparkEntry.queries("q97_mixture_sample")(spark, sf).collect()
    val b = SparkEntry.queries("q97_mixture_sample")(
      spark, sf).collect() // same plan, fresh execution
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    // keep counts respect the per-source rate direction: rate 20
    // sources keep fewer than rate 84 sources on average
    val byRate = a.groupBy(_.getInt(1)).view
      .mapValues(rs => rs.map(r => r.getLong(3).toDouble / r.getLong(2)).sum / rs.size)
    assert(byRate(20) < byRate(84))
  }

  test("q98 withheld clicks are exactly the open-window tail") {
    val out = SparkEntry.queries("q98_stream_left_join")(spark, sf)
    val emittedClicks = out.select("click_id").distinct().count()
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
    val purchases = ev.filter(col("event_type") === "purchase")
    val wm = ev.agg(
      least(max(when(col("event_type") === "click", col("ts"))),
        max(when(col("event_type") === "purchase", col("ts"))))).head().getTimestamp(0)
    // matched clicks always emit; unmatched ones only with a closed window
    val matched = clicks.join(purchases.select(col("user_id").as("pu"),
        col("ts").as("pts")),
      col("user_id") === col("pu") && col("pts") >= col("ts") &&
        col("pts") <= col("ts") + expr("interval 24 hours"), "left_semi")
    val closedUnmatched = clicks
      .join(matched.select(col("event_id").as("m")), col("event_id") === col("m"),
        "left_anti")
      .filter(col("ts") + expr("interval 24 hours") <
        lit(wm) - expr("interval 15 seconds"))
    assert(emittedClicks == matched.select("event_id").distinct().count() +
      closedUnmatched.count())
  }
}
