package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for q77–q79 (oracle hashes are the primary gate). */
class Extended8Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("q77 grouped top-k: exactly k rows per group, plan is group-limit pruned") {
    val df = SparkEntry.queries("q77_grouped_topk")(spark, sf)
    val perGroup = df.groupBy("o_orderpriority").count().collect()
    assert(perGroup.nonEmpty && perGroup.forall(_.getLong(1) <= 2))
    // the rank filter must push a group-limit below the window shuffle
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("q78 length buckets partition the corpus into balanced quartiles") {
    val out = SparkEntry.queries("q78_length_bucket")(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == total)
    // exact quartiles: no bucket holds more than ~35% of a 50-doc corpus
    assert(out.forall(r => r.getLong(1) <= (total * 0.35).ceil.toLong + 1))
  }

  test("q79 keep-latest: one row per key, and it is the newest") {
    val out = SparkEntry.queries("q79_keep_latest")(spark, sf)
    val keys = out.groupBy("user_id", "event_type").count().collect()
    assert(keys.forall(_.getLong(2) == 1))
    val nKeys = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().count()
    assert(out.count() == nKeys)
    // spot-check: the kept ts is the max ts of its key
    val joined = out.select(col("user_id"), col("event_type"), col("ts"))
      .join(Tables.events(spark, sf).groupBy("user_id", "event_type")
        .agg(max("ts").as("max_ts")), Seq("user_id", "event_type"))
    assert(joined.filter(col("ts") =!= col("max_ts")).count() == 0)
  }
}
