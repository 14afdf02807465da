package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch probe (r16): where does a stream query's drain wall go?
  * Prints every micro-batch's durationMs breakdown (queryPlanning /
  * addBatch / commitOffsets / getBatch / latestOffset / walCommit)
  * for a few representative streaming queries at sf0.1.
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[pstream] batch=${p.batchId} rows=${p.numInputRows} $d")
      }
    })
    // warmup (JIT/codegen of the streaming machinery)
    graft.streaming.StreamingQueries.q28(spark, dir).count()
    Seq("q28_stream_tumble", "q57_stream_stream_join",
        "q108_stream_static_join", "q138_stream_dedup_near")
      .foreach { name =>
        println(s"[pstream] ==== $name")
        val t0 = System.nanoTime()
        val n = graft.streaming.StreamingQueries.queries(name)(spark, dir)
          .count()
        println(f"[pstream] $name rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    spark.stop()
  }
}
