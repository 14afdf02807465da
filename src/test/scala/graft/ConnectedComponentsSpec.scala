package graft

import graft.queries.ConnectedComponents
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Connected components: min-label vs large-star/small-star vs an
  * in-memory union-find ground truth, including the long-chain shape
  * where capped min-label is provably wrong and the escalation path
  * must rescue it.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairsDF(edges: Seq[(Long, Long)]): DataFrame =
    edges.toDF("a", "b")

  /** Union-find ground truth: id → min reachable id. */
  private def bruteCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def collectLabels(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("lbl")).toMap

  test("both algorithms match union-find on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val truth = bruteCC(edges)
    val df = pairsDF(edges)
    val (ml, converged, rounds) = ConnectedComponents.minLabel(df)
    assert(converged, s"random graph should converge quickly (rounds=$rounds)")
    assert(collectLabels(ml) === truth)
    assert(collectLabels(ConnectedComponents.largeSmallStar(df)) === truth)
  }

  test("long chain: capped min-label is wrong, large-small-star and labelsFor are right") {
    // path 0-1-2-...-n: diameter n, far beyond the 25-round cap
    val n = 120
    val edges = (0L until n).map(i => (i, i + 1))
    val truth = (0L to n).map(i => i -> 0L).toMap
    val df = pairsDF(edges)
    val (ml, converged, _) = ConnectedComponents.minLabel(df, maxRounds = 25)
    assert(!converged, "a 120-chain must not converge in 25 label rounds")
    // the capped labels are genuinely partial — the far end of the
    // chain has not yet heard about node 0 (this is the silent-wrong
    // failure mode the escalation exists to prevent)
    assert(collectLabels(ml)(n) !== 0L)
    val lss = ConnectedComponents.largeSmallStar(df)
    assert(collectLabels(lss) === truth)
    // the production path escalates automatically
    assert(collectLabels(ConnectedComponents.labelsFor(df)) === truth)
  }

  test("star, clique, and disjoint pairs keep exact labels") {
    val star = (1L to 50L).map(i => (0L, i))
    val clique = for (i <- 100L to 110L; j <- (i + 1) to 110L) yield (i, j)
    val pairs = Seq((200L, 201L), (300L, 301L))
    val edges = star ++ clique ++ pairs
    val truth = bruteCC(edges)
    val df = pairsDF(edges)
    assert(collectLabels(ConnectedComponents.largeSmallStar(df)) === truth)
    assert(collectLabels(ConnectedComponents.labelsFor(df)) === truth)
  }

  test("large-small-star round count is logarithmic on the chain") {
    // measured structurally: a 120-chain converges well inside the
    // 100-round guard (the assert inside largeSmallStar would throw
    // otherwise); rerunning at double length must still converge —
    // O(log n), not O(n)
    val edges = (0L until 240L).map(i => (i, i + 1))
    val labels = collectLabels(
      ConnectedComponents.largeSmallStar(pairsDF(edges)))
    assert(labels === (0L to 240L).map(i => i -> 0L).toMap)
  }
}
