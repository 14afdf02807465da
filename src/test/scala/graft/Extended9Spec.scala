package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for q81–q83 (oracle hashes are the primary gate). */
class Extended9Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("q81 chunks reassemble to the original token stream, in order") {
    import graft.functions.{TextFunctions => T}
    val rejoined = SparkEntry.queries("q81_chunking")(spark, sf)
      .groupBy("doc_id")
      .agg(concat_ws(" ",
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text"))))
          .getField("chunk_text")).as("rejoined"))
    val orig = Tables.documents(spark, sf)
      .select(col("doc_id"), T.normText(col("text")).as("norm"))
    val mismatches = rejoined.join(orig, "doc_id")
      .filter(col("rejoined") =!= col("norm")).count()
    assert(mismatches == 0)
    // every chunk but a doc's last is exactly full
    val short = SparkEntry.queries("q81_chunking")(spark, sf)
      .withColumn("last_idx",
        max(col("chunk_idx")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")))
      .filter(col("chunk_idx") < col("last_idx") &&
        col("n_chunk_tokens") =!= 32).count()
    assert(short == 0)
  }

  test("q82 buckets are 45-minute aligned and cover all events") {
    val out = SparkEntry.queries("q82_time_bucket")(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum == Tables.events(spark, sf).count())
    assert(out.forall(r =>
      r.getTimestamp(0).getTime % (45 * 60 * 1000L) == 0))
  }

  test("q83 numeric range frame: every row is inside its own frame") {
    val out = SparkEntry.queries("q83_range_numeric")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(3) >= 1))          // n_near includes self
    assert(out.forall(r => r.getDouble(4) >= r.getDouble(2) - 1e-6))
  }
}
