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

  /** The native probe must read back exactly what the builtin
    * aggregate accounted: on a collision-free value set a CMS with
    * tiny ε returns EXACT counts, and string items must hash as
    * UTF-8 bytes (the aggregate's addBinary path) — a Java-String
    * hash would silently return garbage here.
    */
  test("cms_estimate reads exact counts back from count_min_sketch") {
    import spark.implicits._
    import org.apache.spark.sql.GraftSqlBridge
    import graft.functions.CmsEstimate
    val rows = (1 to 50).flatMap(i => Seq.fill(i)(s"tok_$i"))
    val df = rows.toDF("tok")
    val sk = df.agg(expr("count_min_sketch(tok, 0.0001d, 0.99d, 7)").as("sk"))
    val est = GraftSqlBridge.column(CmsEstimate(
      GraftSqlBridge.expression(col("sk")),
      GraftSqlBridge.expression(col("tok"))))
    val out = df.distinct().crossJoin(sk).select(col("tok"), est.as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    (1 to 50).foreach { i =>
      assert(out(s"tok_$i") === i.toLong, s"tok_$i")
    }
    // SQL registration path
    graft.plans.GraftExtensions.register(spark)
    sk.createOrReplaceTempView("cms_sk")
    val viaSql = spark.sql(
      "SELECT cms_estimate(sk, 'tok_50') FROM cms_sk").collect().head.getLong(0)
    assert(viaSql === 50L)
  }

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
