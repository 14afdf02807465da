package graft

import graft.queries.Extended22
import org.scalatest.funsuite.AnyFunSuite

/** Integer PageRank vs an independent naive recurrence on authored
  * graphs — the distributed join/agg formulation must reproduce the
  * defined integer semantics node-for-node, and the semantics must
  * behave like PageRank (hubs outrank leaves, symmetry ⇒ equal rank).
  */
class PageRankSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Same recurrence, computed with plain Scala maps. */
  private def naive(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = out.size
    val r0 = Scale / n
    val base = (15L * r0) / 100L
    var r = out.keys.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / out(u) }.sum).toMap
      r = in.map { case (v, mass) => v -> (base + (85L * mass) / 100L) }
    }
    r
  }

  // symmetric star 0–{1,2,3,4} plus a symmetric triangle {10,11,12}
  private val edges: Seq[(Long, Long)] =
    (1L to 4L).flatMap(s => Seq((0L, s), (s, 0L))) ++
      Seq((10L, 11L), (11L, 10L), (11L, 12L), (12L, 11L), (12L, 10L), (10L, 12L))

  test("distributed integer PageRank == naive recurrence, node for node") {
    val got = Extended22.integerPageRank(edges.toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naive(edges, 5))
  }

  test("rank ordering: hub above leaves, symmetric nodes equal") {
    val r = naive(edges, 5)
    assert(r(0L) > r(1L), "star hub must outrank a spoke")
    assert((1L to 4L).map(r).distinct.size === 1, "spokes are symmetric")
    assert(Seq(r(10L), r(11L), r(12L)).distinct.size === 1,
      "triangle nodes are symmetric")
    // 85% damping: ranks move away from the uniform start
    assert(r(0L) !== Scale / 8)
  }

  test("iteration count is respected (ranks differ between 1 and 5 rounds)") {
    val one = Extended22.integerPageRank(edges.toDF("src", "dst"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === naive(edges, 1))
    assert(one !== naive(edges, 5))
  }
}
