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

  test("q29 transform is batch-exact across >=3 micro-batches incl. in-delay late events") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import java.nio.file.{Files, Paths}

    // Three time-split micro-batches; batch 2 carries a LATE event
    // (key B, ts=90s) that is within the 15 s allowed delay of the
    // post-batch-1 watermark (84s-15s=69s) and whose trailing window
    // reaches back into batch-1 events — the cross-batch buffer must
    // serve it. (ts in seconds → micros below.)
    val batches = Seq(
      Seq((1L, 10L, 1L, 1.0), (2L, 18L, 1L, 2.0), (3L, 50L, 1L, 4.0),
        (4L, 80L, 2L, 8.0), (5L, 84L, 2L, 16.0)),
      Seq((6L, 110L, 1L, 32.0), (7L, 90L, 2L, 64.0)), // 7 is late
      Seq((8L, 205L, 1L, 128.0), (9L, 200L, 2L, 256.0)))

    val dir = Files.createTempDirectory("graft_mb_stream").toFile
    dir.deleteOnExit()
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory(s"graft_mb_part$i").toString
      rows.toDF("event_id", "ts_s", "user_id", "value")
        .select(col("event_id"), timestamp_seconds(col("ts_s")).as("ts"),
          col("user_id"), col("value"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, f"batch$i%02d.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1)) // force source file order
    }

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val out = graft.streaming.StreamingQueries.rangeStateTransform(spark, src)
    val name = s"mb_sink_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        "expected >=3 non-empty micro-batches")
      // Watermark-driven state lifecycle: the buffers must hold only
      // the (window + delay) tail per key, not the whole stream.
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 4, s"state leaked: $stateRows rows retained")
    } finally {
      q.stop(); q.awaitTermination()
    }
    val streamed = spark.table(name)
      .select("event_id", "province_id", "ts_us", "pay_amount")
      .collect().map(_.toSeq).toSet
    spark.catalog.dropTempView(name)

    // Batch truth: trailing 10 s RANGE window over the full union.
    import org.apache.spark.sql.expressions.Window
    val all = batches.flatten.toDF("event_id", "ts_s", "user_id", "value")
      .select(col("event_id"), col("user_id"),
        (col("ts_s") * 1000000L).as("ts_us"), col("value"))
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-10000000L, 0L)
    val expected = all
      .select(col("event_id"), col("user_id").as("province_id"), col("ts_us"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .over(w).cast("double").as("pay_amount"))
      .collect().map(_.toSeq).toSet
    assert(streamed === expected)
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
