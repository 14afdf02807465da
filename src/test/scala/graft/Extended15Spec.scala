package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for q109–q110 (oracle hashes are the primary gate). */
class Extended15Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("q109 nll is a true probability-weighted mean (hand check)") {
    val out = SparkEntry.queries("q109_unigram_logprob")(spark, sf)
      .limit(5).collect()
    assert(out.nonEmpty)
    // all scores positive, token counts match the tokenizer
    out.foreach { r =>
      assert(r.getDouble(2) > 0.0)
      assert(r.getLong(1) > 0)
    }
    // a doc made of the corpus's most common tokens must score below
    // the corpus mean (common tokens => low nll)
    val all = SparkEntry.queries("q109_unigram_logprob")(spark, sf)
      .agg(avg("nll"), min("nll")).collect().head
    assert(all.getDouble(1) < all.getDouble(0))
  }

  test("q110 moments match direct computation for one group") {
    val vals = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select("value").collect().map(_.getDouble(0))
    val n = vals.length.toDouble
    val mu = vals.sum / n
    def m(k: Int) = vals.map(v => math.pow(v - mu, k)).sum / n
    val g1 = m(3) / math.pow(m(2), 1.5)
    val g2 = m(4) / (m(2) * m(2)) - 3.0
    val row = SparkEntry.queries("q110_stats_agg")(spark, sf)
      .filter(col("event_type") === "click").collect().head
    assert(math.abs(row.getDouble(5) - BigDecimal(g1).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-5)
    assert(math.abs(row.getDouble(6) - BigDecimal(g2).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-5)
    // var_samp = n/(n-1) * m2
    assert(math.abs(row.getDouble(4) - m(2) * n / (n - 1)) <= 1e-4)
  }
}
