package graft

import graft.plans.AsofJoin
import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-check of the as-of family (backward / forward /
  * nearest, with and without tolerance) against an INDEPENDENT
  * plain-Scala reference on seeded random corpora — the merge
  * operator, the time-negation sugar and the nearest stitch must all
  * agree with the naive per-row scan on data with duplicate times,
  * sparse keys, unmatched keys and boundary-exact matches.
  */
class AsofPropertySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** One random corpus: left (id, key, t), right (key, rt, px) with
    * unique (key, rt) so every match has one well-defined payload.
    * Time range is deliberately tight (0..120) so same-instant hits,
    * empty sides and distance ties all occur.
    */
  private def corpus(seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val left = (1L to 180L).map(id =>
      (id, rnd.nextInt(8).toLong, rnd.nextInt(121).toLong))
    val right = rnd.shuffle(
      (for (k <- 0L to 5L; rt <- 0L to 120L) yield (k, rt))
        .filter(_ => rnd.nextDouble() < 0.12))
      .map { case (k, rt) => (k, rt, k * 1000.0 + rt) }
    (left, right)
  }

  private def ref(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Double)],
      dir: String, tol: Option[Long]): Map[Long, Option[(Long, Double)]] = {
    left.map { case (id, k, t) =>
      val cands = right.filter(_._1 == k).flatMap { case (_, rt, px) =>
        val d = rt - t
        val ok = dir match {
          case "backward" => d <= 0 && tol.forall(-d <= _)
          case "forward"  => d >= 0 && tol.forall(d <= _)
          case "nearest"  => tol.forall(math.abs(d) <= _)
        }
        if (ok) Some((rt, px, math.abs(d))) else None
      }
      val pick = dir match {
        case "backward" => cands.sortBy(_._1).lastOption
        case "forward"  => cands.sortBy(_._1).headOption
        // tie → backward: sort by (distance, rt) so the earlier of two
        // equidistant rows wins
        case "nearest"  => cands.sortBy(c => (c._3, c._2)).headOption
      }
      id -> pick.map(c => (c._1, c._2))
    }.toMap
  }

  private def run(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Double)],
      dir: String, tol: Option[Long]): Map[Long, Option[(Long, Double)]] = {
    val l = left.toDF("id", "k", "t")
    val r = right.toDF("k", "rt", "px")
    val out = dir match {
      case "backward" => AsofJoin.asof(l, r, "k", "t", "rt", tol)
      case "forward"  => AsofJoin.asofForward(l, r, "k", "t", "rt", tol)
      case "nearest"  => AsofJoin.asofNearest(l, r, "k", "t", "rt", "id", tol)
    }
    out.select($"id", $"rt", $"px").collect().map { row =>
      row.getLong(0) -> (if (row.isNullAt(1)) None
        else Some((row.getLong(1), row.getDouble(2))))
    }.toMap
  }

  for (seed <- Seq(7L, 42L); (dir, tol) <- Seq(
      ("backward", None), ("forward", None), ("nearest", None),
      ("backward", Some(9L)), ("forward", Some(9L)), ("nearest", Some(9L))))
    test(s"$dir tol=${tol.getOrElse("none")} seed=$seed matches the naive reference") {
      val (l, r) = corpus(seed)
      val got = run(l, r, dir, tol)
      val want = ref(l, r, dir, tol)
      val diff = want.keySet.filter(id => got.get(id) != Some(want(id)))
      assert(diff.isEmpty,
        s"mismatch on ids ${diff.take(5)}: " +
          diff.take(5).map(id => s"$id got=${got.get(id)} want=${want(id)}"))
      // the corpus must actually exercise matches AND nulls
      assert(want.values.exists(_.isDefined) && want.values.exists(_.isEmpty))
    }
}
