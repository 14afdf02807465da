package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q139 streaming apply: one row per dropped doc — the larger member
  * of ≥1 verified near-dup pair — with the strongest match and the
  * evidence count. Parity against the batch pair set is exact (no LSH
  * draw: stream and batch hash the same deterministic functions), and
  * the online min-id-wins rule must stay a REFINEMENT of the batch
  * q111 clustering rule: any doc with a smaller-id pair is a non-min
  * member of its connected component, so q139's flagged set is always
  * a subset of q111's dropped set (the converse is false by design —
  * chain members with no smaller-id pair of their own survive online).
  */
class Q139StreamDedupApplySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def expectedFromBatch(dir: String): DataFrame =
    SparkEntry.queries("q35_dedup_minhash")(spark, dir)
      .groupBy(col("b").as("doc_id"))
      .agg(max(col("jaccard")).as("max_jaccard"),
        count(lit(1)).as("n_dup_sources"))

  private def assertParity(dir: String): Unit = {
    val got = SparkEntry.queries("q139_stream_dedup_apply")(spark, dir)
      .localCheckpoint()
    val want = expectedFromBatch(dir).localCheckpoint()
    val (ng, nw) = (got.count(), want.count())
    val onlyGot = got.exceptAll(want).count()
    val onlyWant = want.exceptAll(got).count()
    assert(ng == nw && onlyGot == 0 && onlyWant == 0,
      s"stream-apply/batch divergence at $dir: got $ng vs want $nw " +
        s"rows, got-only $onlyGot, want-only $onlyWant")
    assert(ng > 0, s"no drop verdicts at $dir — vacuous parity")
  }

  test("q139 drop verdicts == batch pair set grouped by larger member (sf0.001)") {
    assertParity(SparkTestSession.sf)
  }

  test("q139 drop verdicts == batch pair set grouped by larger member (sf0.01)") {
    assertParity("/root/testdata/sf0.01")
  }

  test("q139 flagged set is a subset of q111's dropped set (online refines CC)") {
    val dir = "/root/testdata/sf0.01"
    val flagged = SparkEntry.queries("q139_stream_dedup_apply")(spark, dir)
      .select("doc_id")
    val kept = SparkEntry.queries("q111_dedup_apply")(spark, dir)
      .select("doc_id")
    val flaggedButKept = flagged.intersect(kept).count()
    assert(flaggedButKept == 0,
      s"$flaggedButKept docs flagged by the online rule survive q111 — " +
        "a smaller-id pair member must be a non-min component member")
  }
}
