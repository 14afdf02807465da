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

  test("q138 emits each pair exactly once (no cross-bucket duplicates)") {
    val out = pairs("q138_stream_dedup_near", "/root/testdata/sf0.01")
    val n = out.count()
    val nDistinct = out.select("a", "b").distinct().count()
    assert(n == nDistinct,
      s"ownership rule failed: $n pair rows but $nDistinct distinct " +
        "(a,b) — some pair was emitted by more than one bucket")
  }
}
