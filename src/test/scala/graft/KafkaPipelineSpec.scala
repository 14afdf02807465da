package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, StandardOpenOption}

/** KafkaPipeline — the reference's end-to-end topology
  * (`window_aggregation.py`) with real connector wiring. The Kafka
  * connector jar is absent from this image, so the suite proves the
  * two halves separately:
  *  1. everything on OUR side of the connector boundary — record
  *     projection, JSON codec, watermark, the stateful trailing-range
  *     transform, sink schema/codec — over Kafka-record-shaped frames
  *     driven through a real micro-batch stream;
  *  2. the source/sink calls reach the connector LOOKUP and fail
  *     there (not earlier, not differently) — the exact point where
  *     adding `spark-sql-kafka-0-10` to the classpath completes the
  *     pipeline.
  */
class KafkaPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** The reference wire format: JSON payment messages. Two provinces,
    * event times chosen so trailing-10 s windows both include and
    * exclude earlier batch-mates.
    */
  private val recs = Seq(
    """{"createTime": "2023-09-20 10:00:01", "orderId": 1, "payAmount": 10.50, "payPlatform": 0, "provinceId": 1}""",
    """{"createTime": "2023-09-20 10:00:04", "orderId": 2, "payAmount": 2.25, "payPlatform": 1, "provinceId": 1}""",
    """{"createTime": "2023-09-20 10:00:11", "orderId": 3, "payAmount": 7.00, "payPlatform": 0, "provinceId": 2}""",
    """{"createTime": "2023-09-20 10:00:14", "orderId": 4, "payAmount": 1.75, "payPlatform": 1, "provinceId": 1}""",
    """{"createTime": "2023-09-20 10:00:21", "orderId": 5, "payAmount": 4.00, "payPlatform": 0, "provinceId": 2}""")

  /** Trailing-10 s sums per event, hand-computed: window = [ts-10s, ts]
    * within the event's province.
    *   p1: t=01 → 10.50; t=04 → 12.75; t=14 → 2.25+1.75 = 4.00 (t=01
    *       is outside [04,14]); p2: t=11 → 7.00; t=21 → 11.00.
    */
  private val expectedAll =
    Set((1, 10.50), (1, 12.75), (1, 4.00), (2, 7.00), (2, 11.00))

  /** A Kafka-record-shaped micro-batch stream: the JSON lines as a
    * BINARY `value` plus the connector's metadata columns, delivered
    * across ≥2 micro-batches (maxFilesPerTrigger=1, mtime-ordered).
    */
  private def kafkaShapedStream() = {
    val dir = Files.createTempDirectory("graft_kafka_shape")
    dir.toFile.deleteOnExit()
    recs.grouped(3).zipWithIndex.foreach { case (chunk, i) =>
      val f = Paths.get(dir.toString, f"msg$i%02d.jsonl")
      Files.write(f, chunk.mkString("", "\n", "\n").getBytes,
        StandardOpenOption.CREATE)
      f.toFile.setLastModified(1000000L * (i + 1))
    }
    spark.readStream.option("maxFilesPerTrigger", "1").text(dir.toString)
      .select(col("value").cast("binary").as("value"),
        lit(null).cast("binary").as("key"),
        lit("payment_msg").as("topic"),
        lit(0).as("partition"),
        lit(0L).as("offset"),
        current_timestamp().as("timestamp"),
        lit(0).as("timestampType"))
  }

  private def drain(out: org.apache.spark.sql.DataFrame, prefix: String) = {
    val name = s"${prefix}_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try { q.processAllAvailable() } finally { q.stop(); q.awaitTermination() }
    val rows = spark.table(name).collect()
    spark.catalog.dropTempView(name)
    rows
  }

  test("paymentRangeSum over Kafka-record-shaped stream matches the " +
      "hand-computed trailing sums in the reference sink schema") {
    val out = graft.streaming.KafkaPipeline
      .paymentRangeSum(spark, kafkaShapedStream())
    val rows = drain(out, "kafka_pipe")
    assert(rows.head.schema.fieldNames.toSeq ===
      Seq("province_id", "pay_amount"))
    val got = rows.map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(got === expectedAll)
  }

  test("held emission withholds events within the allowed delay of " +
      "the stream maximum (reference emission order)") {
    val out = graft.streaming.KafkaPipeline
      .paymentRangeSum(spark, kafkaShapedStream(), heldEmission = true)
    val got = drain(out, "kafka_pipe_held")
      .map(r => (r.getInt(0), r.getDouble(1))).toSet
    // final watermark = 10:00:21 − 15 s = 10:00:06 → only t=01 and
    // t=04 (both province 1) are provably complete at drain
    assert(got === Set((1, 10.50), (1, 12.75)))
  }

  test("sink codec emits one JSON object per result row") {
    import spark.implicits._
    // batch frame in the sink schema through the same JSON encoder
    val sunk = graft.streaming.StreamingQueries.toJsonSink(
      Seq((1, 10.50), (2, 7.00)).toDF("province_id", "pay_amount"))
      .collect().map(_.getString(0))
    assert(sunk.toSet === Set(
      """{"province_id":1,"pay_amount":10.5}""",
      """{"province_id":2,"pay_amount":7.0}"""))
  }

  test("source and sink fail at the connector lookup boundary — the " +
      "one-jar swap-in point") {
    val srcErr = intercept[Exception] {
      graft.streaming.KafkaPipeline.source(spark, "localhost:9092")
    }
    assert(srcErr.getMessage.toLowerCase.contains("kafka"))

    val ckpt = Files.createTempDirectory("graft_kafka_ckpt")
    ckpt.toFile.deleteOnExit()
    val sinkErr = intercept[Exception] {
      graft.streaming.KafkaPipeline.sink(
        graft.streaming.KafkaPipeline.paymentRangeSum(
          spark, kafkaShapedStream()),
        "localhost:9092", checkpointDir = ckpt.toString)
    }
    assert(sinkErr.getMessage.toLowerCase.contains("kafka"))
  }
}
