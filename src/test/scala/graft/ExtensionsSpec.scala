package graft

import graft.plans.GraftExtensions
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("cosine_sim and srp_code are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       srp_code(array(CAST(1.0 AS FLOAT), CAST(0.5 AS FLOAT)), 4, 6) AS code
        |""".stripMargin).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getSeq[Int](1).length === 4)
  }

  test("srp_code SQL output matches the Column API expression") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val df = Tables.embeddings(spark, SparkTestSession.sf).limit(20)
    val viaSql = df.selectExpr("vec_id", "srp_code(embedding, 4, 6) AS c")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val viaApi = df.select(col("vec_id"),
        graft.queries.Lsh.srpCodes(col("embedding"), 4, 6).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(viaSql === viaApi)
  }
}
