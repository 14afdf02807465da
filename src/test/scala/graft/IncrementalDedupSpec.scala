package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q136 — incremental (asymmetric) dedup. The defining property: the
  * standing-index probe must be EQUIVALENT to rerunning the symmetric
  * pipeline on the grown corpus — pairs(full) = pairs(base-only) ∪
  * pairs(increment) — while never recomputing a base-vs-base pair
  * (the architectural point; the probe stages are shard-sized).
  * At gate scale recall is 1 everywhere (testdata similarity gap), so
  * the identity is EXACT set equality, not a bound.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def pairRows(df: org.apache.spark.sql.DataFrame) =
    df.select("a", "b", "jaccard").collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Double]("jaccard"))).toSet

  test("q136: increment ∪ base-only ≡ full symmetric rerun, disjointly") {
    val split = DedupQueries.incrementalSplit(spark, sf)
    assert(split > 0L)
    val full = pairRows(DedupQueries.nearDupPairs(spark, sf))
    val base = pairRows(DedupQueries.nearDupPairsBelow(spark, sf, split))
    val incrDf = DedupQueries.incrementalPairs(spark, sf)
    val incr = pairRows(incrDf)
    // every incremental pair touches the increment (b is the higher id)
    assert(incr.forall(_._2 >= split),
      s"pair with both sides below split=$split leaked into the increment")
    // base-only pairs never touch it
    assert(base.forall(_._2 < split))
    // the identity — and disjointness, so the union is a partition
    assert((base & incr) === Set.empty)
    assert(base ++ incr === full,
      s"missed: ${full -- base -- incr}; invented: ${(base ++ incr) -- full}")
    assert(incr.nonEmpty, "testdata plants near-dups in the top-id fifth")
  }

  test("q136: vs_base labels new-vs-base rows; canonical ordering") {
    val split = DedupQueries.incrementalSplit(spark, sf)
    val rows = DedupQueries.incrementalPairs(spark, sf).collect()
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      assert(a < b, s"pair not canonical: ($a, $b)")
      assert(r.getAs[Boolean]("vs_base") === (a < split))
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
    // both pair kinds occur at gate scale (planted dups straddle and
    // sit inside the top fifth)
    assert(rows.exists(_.getAs[Boolean]("vs_base")))
  }

  test("q136: the standing index is memoized (warm probes reuse it)") {
    val i1 = DedupQueries.incrementalSplit(spark, sf)
    val i2 = DedupQueries.incrementalSplit(spark, sf)
    assert(i1 === i2)
  }
}
