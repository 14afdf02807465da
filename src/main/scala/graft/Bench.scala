package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Dump all JVM thread stacks to stderr — fired by the watchdog when
    * a query exceeds the soft deadline, to diagnose where a slow run
    * actually spends its time (the r1/r2 bench bimodality was only
    * attributable after the fact; this makes the next spike
    * self-describing).
    */
  private def dumpStacks(tag: String): Unit = {
    System.err.println(s"[bench-watchdog] $tag exceeded soft deadline; thread dump:")
    import scala.jdk.CollectionConverters._
    Thread.getAllStackTraces.asScala.foreach { case (t, frames) =>
      System.err.println(s"  --- ${t.getName} (${t.getState})")
      frames.take(12).foreach(f => System.err.println(s"      at $f"))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // bound per-query metadata retention: 50+ queries in one session
      // otherwise accumulate listener/state backlog that taxes later,
      // shuffle-stage-heavy queries
      .config("spark.sql.ui.retainedExecutions", "5")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional local-iteration subset (driver runs the full set)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Untimed warmup: first query otherwise pays one-off JVM/JIT,
    // codegen-compiler and parquet-reader init (~3 s measured on
    // q01) — session setup cost, not query cost. The tokens-regex
    // chain JIT is the same class of one-off (~7 s measured on the
    // first text/dedup query), so warm it on a small slice too.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    locally {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/documents.parquet")
        .limit(64)
        .select(graft.functions.TextFunctions.tokens(col("text")).as("t"))
        .select(sum(size(col("t")))).collect()
    }
    val errors = scala.collection.mutable.Map[String, String]()
    // toSeq.sortBy: fixed execution order + per-query progress on
    // stderr (stdout stays JSON-only for the driver)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val watchdog = new Thread(() => {
        try {
          // repeat dumps while the query is stuck: successive stacks
          // distinguish a livelock (same frames each time) from slow
          // progress (frames advance), which one snapshot can't
          var k = 0
          while (k < 4) {
            Thread.sleep(30000)
            if (!done.get()) dumpStacks(s"$name +${30 * (k + 1)}s")
            k += 1
          }
        } catch { case _: InterruptedException => () }
      }, s"bench-watchdog-$name")
      watchdog.setDaemon(true)
      watchdog.start()
      try fn(spark, sfDir).count()
      catch {
        // A crashed query must be visible as a crash, not a timing:
        // record it in `errors` (the driver sees both maps).
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1)
              .mkString.take(160)
      } finally {
        done.set(true)
        watchdog.interrupt()
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2f s" +
        (if (errors.contains(name)) s"  ERROR ${errors(name)}" else ""))
      spark.catalog.clearCache()
      System.gc() // stable baseline between queries (one shared session)
      name -> dt
    }.toMap
    def jstr(s: String) =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errs = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    // Compact summary LAST: the driver records only the tail of the
    // output, and with 126 queries the full line above outgrows that
    // window — r03's record lost its own total to front-truncation.
    // Everything a reader needs survives in this short final line.
    val slow = results.toSeq.sortBy(-_._2).take(8)
      .map { case (k, v) => jstr(k) + ":" + f"$v%.2f" }.mkString("{", ",", "}")
    println(s"""{"metric":"total_compact","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"slowest":$slow,"sf":"$sfDir"}""")
    spark.stop()
  }
}
