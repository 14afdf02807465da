package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** q138 streaming near-dup dedup: the drained stream must equal the
  * batch q35 pair set — same blocking keys, same verify encoding, so
  * any divergence is a real semantic hole (a missed bucket, a broken
  * ownership rule, a wrong exact shortcut), not LSH draw noise (there
  * is no draw: both sides hash the same deterministic functions).
  */
class Q138StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def pairs(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir).select("a", "b", "jaccard")

  private def assertMultisetEqual(dir: String): Unit = {
    val stream = pairs("q138_stream_dedup_near", dir).localCheckpoint()
    val batch = pairs("q35_dedup_minhash", dir).localCheckpoint()
    val (ns, nb) = (stream.count(), batch.count())
    val onlyStream = stream.exceptAll(batch).count()
    val onlyBatch = batch.exceptAll(stream).count()
    assert(ns == nb && onlyStream == 0 && onlyBatch == 0,
      s"stream/batch near-dup divergence at $dir: stream $ns vs batch " +
        s"$nb rows, stream-only $onlyStream, batch-only $onlyBatch")
    assert(ns > 0, s"no near-dup pairs at $dir — vacuous parity")
  }

  test("q138 drained stream == batch q35 pair set (sf0.001)") {
    assertMultisetEqual(SparkTestSession.sf)
  }

  test("q138 drained stream == batch q35 pair set (sf0.01)") {
    assertMultisetEqual("/root/testdata/sf0.01")
  }

  /** r14 (VERDICT r13 #3): the REAL streaming regime is many
    * micro-batches, and the stream-static verify side must not
    * re-shingle the corpus per batch. Two assertions: (a) semantics —
    * a multi-file corpus drained one file per trigger still equals
    * the batch q35 pair set; (b) structure — the verify side of the
    * streaming frame is a materialized LogicalRDD leaf (the eager
    * feats checkpoint), with NO batch parquet relation left in the
    * plan for the per-batch planner to recompute.
    */
  test("q138 multi-batch (maxFilesPerTrigger=1): parity holds, feats side is a leaf") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft_q138_mb")
    Tables.documents(spark, SparkTestSession.sf)
      .repartition(3)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    spark.conf.set("spark.graft.stream.maxFilesPerTrigger", "1")
    try {
      // (b) plan structure, checked on the un-drained streaming frame
      val frame = graft.streaming.StreamingQueries
        .streamNearDupPairs(spark, tmp.toString)
      val analyzed = frame.queryExecution.analyzed
      val leaves = analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr }
      assert(leaves.nonEmpty,
        "verify side is not a materialized leaf — the corpus feature " +
          "pass would re-run every micro-batch")
      val batchRelations = analyzed.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation
          if !r.isStreaming => r }
      assert(batchRelations.isEmpty,
        s"batch relation(s) in the per-batch plan: $batchRelations")
      // (a) parity across 3 single-file micro-batches
      val stream = pairs("q138_stream_dedup_near", tmp.toString)
        .localCheckpoint()
      val batch = pairs("q35_dedup_minhash", tmp.toString).localCheckpoint()
      val (ns, nb) = (stream.count(), batch.count())
      val diff = stream.exceptAll(batch).count() +
        batch.exceptAll(stream).count()
      assert(ns == nb && diff == 0,
        s"multi-batch stream diverged from batch q35: $ns vs $nb rows, " +
          s"symmetric diff $diff")
      assert(ns > 0, "vacuous multi-batch parity")
      // and the apply stream (q139) shares the engine: drain it too so
      // the multi-batch path of the shared frame is exercised end-to-end
      val applied = SparkEntry.queries("q139_stream_dedup_apply")(
        spark, tmp.toString)
      assert(applied.count() > 0)
      assert(applied.select(col("doc_id")).distinct().count() ==
        applied.count())
    } finally spark.conf.unset("spark.graft.stream.maxFilesPerTrigger")
  }

  test("q138 emits each pair exactly once (no cross-bucket duplicates)") {
    val out = pairs("q138_stream_dedup_near", "/root/testdata/sf0.01")
    val n = out.count()
    val nDistinct = out.select("a", "b").distinct().count()
    assert(n == nDistinct,
      s"ownership rule failed: $n pair rows but $nDistinct distinct " +
        "(a,b) — some pair was emitted by more than one bucket")
  }
}
