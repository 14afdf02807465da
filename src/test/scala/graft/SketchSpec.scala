package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate-aggregation (sketch) surface: values are
  * engine-specific so they can't hash-match a DuckDB oracle; instead
  * assert the documented error bounds against exact answers.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("approx_count_distinct (HLL++) within rsd of exact") {
    val li = Tables.lineitem(spark, sf)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")
    ).collect().head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile within rank tolerance of exact percentile") {
    val li = Tables.lineitem(spark, sf)
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx")
    ).collect().head
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
