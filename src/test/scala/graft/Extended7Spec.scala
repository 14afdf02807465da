package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the q70–q76 batch (oracle hashes are the
  * primary gate; these assert the properties the oracles can't —
  * set-level invariants a wrong-but-consistent pair would satisfy).
  */
class Extended7Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("q70 decontamination: flagged docs truly share a 3-gram; eval docs excluded") {
    import graft.functions.{TextFunctions => T}
    val out = SparkEntry.queries("q70_decontaminate")(spark, sf).collect()
    assert(out.nonEmpty, "no contaminated docs found in testdata")
    assert(out.forall(_.getLong(1) >= 1))
    // no eval doc reports itself
    assert(out.forall(r => r.getLong(0) % 97 != 0))
    // brute-force recheck of one flagged doc
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .select(col("doc_id"), array_distinct(T.wordNGrams(col("toks"), 3)).as("g"))
    val evalGrams = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(col("g")).as("g")).distinct().collect().map(_.getString(0)).toSet
    val one = out.head.getLong(0)
    val oneGrams = docs.filter(col("doc_id") === one)
      .select(explode(col("g"))).collect().map(_.getString(0)).toSet
    assert((oneGrams & evalGrams).size == out.head.getLong(1))
  }

  test("q71 redaction leaves no residual sensitive spans") {
    val out = SparkEntry.queries("q71_pii_redact")(spark, sf)
    val residual = out.filter(
      col("redacted").rlike("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}") ||
      col("redacted").rlike("[0-9]{6,}")).count()
    assert(residual == 0)
  }

  test("q72 split partitions the corpus deterministically") {
    val out = SparkEntry.queries("q72_train_split")(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == total)
    val again = SparkEntry.queries("q72_train_split")(spark, sf).collect()
    assert(out.map(_.toSeq.toList).toList == again.map(_.toSeq.toList).toList)
  }

  test("q73 oversampling replicates by the per-language factor") {
    val out = SparkEntry.queries("q73_oversample")(spark, sf)
    val perDoc = out.groupBy("lang", "doc_id").agg(count(lit(1)).as("n"),
      max(col("copy_idx")).as("mx")).collect()
    assert(perDoc.forall { r =>
      val want = r.getString(0) match {
        case "zh" => 3; case "de" => 2; case _ => 1 }
      r.getLong(2) == want && r.getInt(3) == want
    })
  }

  test("q74 tf-idf scores agree with a locally recomputed definition") {
    val out = SparkEntry.queries("q74_tfidf")(spark, sf).collect()
    assert(out.nonEmpty)
    val n = Tables.documents(spark, sf).count().toDouble
    out.foreach { r =>
      val (tf, df, score) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(tf >= 6)
      assert(math.abs(score - BigDecimal(tf * math.log(n / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("q75 streamed session windows respect the 30-minute gap invariant") {
    val out = SparkEntry.queries("q75_stream_session_window")(spark, sf)
      .collect().groupBy(_.getLong(0))
    // within a user: consecutive sessions are separated by >= gap
    // (next start >= previous end, where end = last event + gap)
    out.values.foreach { sessions =>
      val sorted = sessions.sortBy(_.getTimestamp(1).getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!b.getTimestamp(1).before(a.getTimestamp(2)))
        case _ => ()
      }
    }
    // session totals cover every event exactly once
    val nEvents = out.values.flatten.map(_.getLong(3)).sum
    assert(nEvents == Tables.events(spark, sf).count())
  }

  test("q76 window navigation: first/last/nth are consistent per user") {
    val rows = SparkEntry.queries("q76_window_nav")(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(1))
    byUser.values.foreach { rs =>
      assert(rs.map(_.getDouble(3)).distinct.length == 1, "first_v constant per user")
      assert(rs.map(_.getDouble(4)).distinct.length == 1, "last_v constant per user")
    }
  }
}
