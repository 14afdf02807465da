package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter join pruning — the mechanism that makes a
  * selective dim-filtered fact join scale when the dim is too big to
  * broadcast: Catalyst builds a Bloom filter from the (filtered)
  * creation side and injects `might_contain` into the fact scan, so
  * most fact rows die at the scan instead of crossing the shuffle.
  *
  * The thresholds exist for small data (locally a 60k-row join
  * doesn't need a filter), so the spec zeroes them to prove the
  * engine's plans are ELIGIBLE — the same query shape at 100 TB
  * injects the filter with stock thresholds.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("selective dim join injects a bloom runtime filter on the fact side") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1000GB")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // force a shuffle join: broadcast would subsume the runtime filter
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val li = Tables.lineitem(s2, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(s2, sf)
      .filter(col("o_totalprice") > 100000.0) // selective creation side
      .select("o_orderkey", "o_totalprice")
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))

    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"no bloom runtime filter injected:\n$plan")

    // the filter is semantics-free: same rows as the unfiltered session
    val expected = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .join(Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 100000.0)
        .select("o_orderkey", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() === expected)
  }
}
