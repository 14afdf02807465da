package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming re-expression of the reference's execution
  * model (SURVEY.md §2 q28–q29): schema'd stream source → event-time
  * windowed / stateful transform → sink.
  *
  * Reference: `/root/reference/window_aggregation.py` — Kafka JSON
  * source with a 15 s watermark, per-message trailing 10 s RANGE-window
  * sum per province, JSON sink. The Kafka connector jar isn't in this
  * image, so the demos run file-source → memory-sink; the transforms
  * are connector-agnostic (any streaming DataFrame in, DataFrame out).
  */
object StreamingQueries {

  /** Raw events schema as stored (ts = int64 nanos, see Tables.events). */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of the events parquet with the same ns→µs
    * normalization as the batch loader.
    */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** The reference's source-decl surface: a JSON-lines stream (the
    * wire format of its Kafka topic) decoded against an explicit
    * schema with an event-time watermark — `create_table(schema=...,
    * watermark=...)` re-expressed (window_aggregation.py:33-52).
    */
  def jsonPaymentSource(s: SparkSession, lines: DataFrame,
      allowedDelay: String = "15 seconds"): DataFrame = {
    val schema = StructType(Seq(
      StructField("createTime", TimestampType),
      StructField("orderId", LongType),
      StructField("payAmount", DoubleType),
      StructField("payPlatform", IntegerType),
      StructField("provinceId", IntegerType)))
    val decoded = lines
      .select(from_json(col("value").cast("string"), schema).as("m"))
      .select(col("m.*"))
    if (decoded.isStreaming) decoded.withWatermark("createTime", allowedDelay)
    else decoded
  }

  /** JSON sink encoding (the reference's sink table format). */
  def toJsonSink(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

  // ---------------------------------------------------------------- q28
  /** Tumbling event-time window aggregation executed as a REAL
    * streaming query (file source → complete-mode memory sink), then
    * returned as a DataFrame. Deterministic: `processAllAvailable`
    * drains the source, complete mode emits full state. Oracle = the
    * batch q27 SQL — stream/batch parity is the semantic claim.
    */
  def q28(s: SparkSession, dir: String): DataFrame = {
    val name = s"q28_sink_${System.nanoTime()}"
    val agged = eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
    val q = agged.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
      q.awaitTermination()
    }
    materializeAndDrop(s, name)
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n"), col("total"))
      .orderBy("win_start", "event_type")
  }

  /** Snapshot a memory-sink table into a local DataFrame and drop the
    * temp view, so finished streaming queries leave no session state
    * behind (Verify/Bench run many queries in one session).
    */
  private def materializeAndDrop(s: SparkSession, name: String): DataFrame = {
    val t = s.table(name)
    val out = s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(t.collect(): _*)),
      t.schema)
    s.catalog.dropTempView(name)
    // Evict cached state-store providers (q29's keeps the whole event
    // buffer of the last batch in memory): a finished stream must not
    // tax later batch queries sharing the session/heap.
    org.apache.spark.sql.GraftSqlBridge.unloadStateStores()
    out
  }

  // ---------------------------------------------------------------- q29
  /** The reference flagship as a STATEFUL stream: per event, the
    * trailing 10 s per-key sum (window_aggregation.py:75-82), via
    * `flatMapGroupsWithState` with a per-key event buffer.
    *
    * State design for scale: the buffer holds only events inside the
    * trailing window span behind the newest processed event (plus
    * allowed lateness), evicted each batch — state is O(keys ×
    * window-rate), independent of stream length. Late events emit
    * their own correct window (events ≤ their timestamp) and
    * retro-extend sums of previously-emitted events only within the
    * same batch, matching the batch RANGE-window semantics when the
    * source drains in one batch (asserted against q20 in
    * StreamingSpec; oracle = q20 SQL).
    */
  def q29(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val name = s"q29_sink_${System.nanoTime()}"
    val windowMicros = 10000000L // 10 s, matching the reference interval

    val typed = eventsStream(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[(Long, Long, Long, Double)]

    // Exact-decimal sum matching `CAST(SUM(CAST(v AS DECIMAL(18,2))) AS
    // DOUBLE)` on both engines of the oracle pair.
    def d2(v: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(v).setScale(2, java.math.RoundingMode.HALF_UP)

    val out = typed
      .groupByKey(_._2)
      .flatMapGroupsWithState[List[(Long, Long, Double)], (Long, Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Long, Double)],
         state: GroupState[List[(Long, Long, Double)]]) =>
          val buffered = state.getOption.getOrElse(Nil)
          val incoming = rows.map(r => (r._1, r._3, r._4)).toList
          val all = (buffered ++ incoming).sortBy(e => (e._2, e._1))
          // Emit one result per *incoming* event: sum over all events of
          // this key with ts in [ts_e - 10 s, ts_e].
          val newIds = incoming.map(_._1).toSet
          val results = all.iterator.filter(e => newIds.contains(e._1)).map {
            case (id, ts, _) =>
              val lo = ts - windowMicros
              val sum = all.iterator
                .filter(e => e._2 >= lo && e._2 <= ts)
                .foldLeft(java.math.BigDecimal.ZERO)((acc, e) => acc.add(d2(e._3)))
              (id, key, ts, sum.doubleValue)
          }.toList
          // Evict state older than the newest event minus the window
          // span (single-source-of-truth for the trailing window).
          val horizon = if (all.nonEmpty) all.map(_._2).max - windowMicros else 0L
          state.update(all.filter(_._2 >= horizon))
          results.iterator
      }
      .toDF("event_id", "province_id", "ts_us", "pay_amount")

    val q = out.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
      q.awaitTermination()
    }
    materializeAndDrop(s, name)
      .select(col("event_id"), col("province_id"),
        timestamp_micros(col("ts_us")).as("ts"), col("pay_amount"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- q47
  /** Streaming deduplication: `dropDuplicates` over the key columns —
    * the streaming form of exact dedup (state = one bit per key,
    * bounded by a watermark in production). Oracle: batch DISTINCT,
    * which a drained stream must equal.
    */
  def q47(s: SparkSession, dir: String): DataFrame = {
    val name = s"q47_sink_${System.nanoTime()}"
    val deduped = eventsStream(s, dir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    val q = deduped.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
      q.awaitTermination()
    }
    materializeAndDrop(s, name).orderBy("user_id", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_stream_tumble"      -> (q28 _),
    "q29_stream_range_state" -> (q29 _),
    "q47_stream_dedup"       -> (q47 _))

  /** Streaming results are asserted identical to their batch forms, so
    * they reuse the batch oracle SQL (q27 / q20 shapes).
    */
  val oracles: Map[String, String] = Map(
    "q28_stream_tumble" ->
      """SELECT date_trunc('hour', ts) AS win_start, event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q29_stream_range_state" ->
      """SELECT event_id, user_id AS province_id, ts,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
        |       (PARTITION BY user_id ORDER BY ts
        |        RANGE BETWEEN INTERVAL 10 SECONDS PRECEDING AND CURRENT ROW)
        |       AS DOUBLE) AS pay_amount
        |FROM events ORDER BY event_id""".stripMargin,
    "q47_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin)
}
