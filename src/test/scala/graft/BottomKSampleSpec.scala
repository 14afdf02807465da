package graft

import graft.functions.BottomKSample
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native bounded-sample aggregate: value-exactness against a
  * locally computed ground truth, shard-independence (the merge path),
  * and the SQL registration.
  */
class BottomKSampleSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def hashOf(id: Long): Long = id * 0x9E3779B97F4A7C15L

  private def agg(k: Int) = GraftSqlBridge.column(
    BottomKSample(GraftSqlBridge.expression(col("id")), k)
      .toAggregateExpression())

  test("keeps exactly the k smallest-hash ids, hash-ascending") {
    val ids = (0L until 1000L).map(i => i * 37 % 1000)
    val expected = ids.sortBy(hashOf).take(10)
    val got = ids.toDF("id").agg(agg(10).as("s"))
      .collect().head.getSeq[Long](0)
    assert(got === expected)
  }

  test("shard-independent: 1 partition == 32 partitions (merge path)") {
    val df = spark.range(0, 5000).select(col("id"),
      (col("id") % 7).as("g"))
    def run(parts: Int) =
      df.repartition(parts).groupBy("g").agg(agg(5).as("s"))
        .orderBy("g").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(run(1).toSeq === run(32).toSeq)
  }

  test("k >= group size returns the whole group") {
    val got = Seq(1L, 2L, 3L).toDF("id").agg(agg(10).as("s"))
      .collect().head.getSeq[Long](0)
    assert(got.sorted === Seq(1L, 2L, 3L))
    assert(got === Seq(1L, 2L, 3L).sortBy(hashOf))
  }

  test("callable from SQL as bottomk_sample(col, k)") {
    graft.plans.GraftExtensions.register(spark)
    spark.range(0, 100).createOrReplaceTempView("bks_ids")
    val got = spark.sql(
      "SELECT bottomk_sample(id, 4) AS s FROM bks_ids")
      .collect().head.getSeq[Long](0)
    assert(got === (0L until 100L).sortBy(hashOf).take(4))
  }
}
