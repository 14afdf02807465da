package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end composition check: the library's stages chain into the
  * actual training-data pipeline shape — dedup APPLY → quality gate →
  * deterministic split — with conservation and determinism invariants
  * that individual per-query specs can't see.
  */
class PipelineSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("dedup -> quality gate -> split composes with row conservation") {
    // Stage 1: deduplicated corpus (q111)
    val kept = SparkEntry.queries("q111_dedup_apply")(spark, sf)
      .select("doc_id")
    // Stage 2: quality gate — keep docs with a computable token floor
    val quality = Tables.documents(spark, sf)
      .select(col("doc_id"),
        functions.TextFunctions.wsTokenCount(col("text")).as("n_toks"))
      .filter(col("n_toks") >= 5)
      .select("doc_id")
    val gated = kept.join(quality, "doc_id")
    // Stage 3: deterministic 80/10/10 split (q72's row-local rule)
    val split = gated.withColumn("bucket",
      pmod(col("doc_id") * lit(2654435761L), lit(10L)))
      .withColumn("part",
        when(col("bucket") < 8, "train")
          .when(col("bucket") === 8, "val")
          .otherwise("test"))
    val byPart = split.groupBy("part").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // conservation: every gated doc lands in exactly one part
    assert(byPart.values.sum == gated.count())
    assert(byPart.keySet == Set("train", "val", "test"))
    // determinism: a second full evaluation yields identical splits
    val again = split.select("doc_id", "part").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val first = split.select("doc_id", "part").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(first == again)
    // the dedup stage actually removed something and kept keepers
    assert(kept.count() < Tables.documents(spark, sf).count())
  }
}
