package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch equivalence — the strongest checkable claim for the
  * reference's streaming semantics (SURVEY.md §5): the streaming
  * execution of a window aggregation must produce exactly the batch
  * answer once the source is drained.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def rowsOf(name: String) =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq

  test("q28 streaming tumble == q27 batch tumble") {
    assert(rowsOf("q28_stream_tumble") === rowsOf("q27_tumble_batch"))
  }

  test("q29 stateful stream range-window == q20 batch range-window") {
    val stream = SparkEntry.queries("q29_stream_range_state")(spark, sf)
      .select("event_id", "province_id", "ts", "pay_amount")
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q20_window_range")(spark, sf)
      .select("event_id", "province_id", "ts", "pay_amount")
      .collect().map(_.toSeq).toSeq
    assert(stream === batch)
  }

  test("json payment source decodes the reference wire format with watermark") {
    import spark.implicits._
    val lines = Seq(
      """{"createTime": "2023-09-20 22:19:02.224", "orderId": 1695248388, "payAmount": 88694.71922270155, "payPlatform": 0, "provinceId": 6}""")
      .toDF("value")
    val decoded = graft.streaming.StreamingQueries
      .jsonPaymentSource(spark, lines)
    val r = decoded.collect().head
    assert(r.getAs[Long]("orderId") === 1695248388L)
    assert(r.getAs[Int]("provinceId") === 6)
    val sinkRow = graft.streaming.StreamingQueries.toJsonSink(
      decoded.select(col("provinceId").as("province_id"),
        col("payAmount").as("pay_amount"))).collect().head
    assert(sinkRow.getString(0).contains("\"province_id\":6"))
  }
}
