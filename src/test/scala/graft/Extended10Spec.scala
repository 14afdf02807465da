package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for q85–q90 (oracle hashes are the primary gate). */
class Extended10Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("q85 shared spans really occur in >1 document") {
    val out = SparkEntry.queries("q85_shared_spans")(spark, sf).limit(3).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .trim.replaceAll("\\s+", " ")).toMap
    out.foreach { r =>
      val span = r.getString(0)
      val holders = docs.count { case (_, t) => t.contains(span) }
      assert(holders >= r.getLong(1),
        s"span '$span' claimed in ${r.getLong(1)} docs, found $holders")
    }
  }

  test("q86 profile matches direct per-column checks") {
    val out = SparkEntry.queries("q86_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables.events(spark, sf)
    assert(out("event_id")._1 == 0)
    assert(out("event_id")._2 == ev.count())
    assert(out("event_type")._2 == 5)
  }

  test("q87 PMI is symmetric in its marginals definition") {
    val out = SparkEntry.queries("q87_collocations")(spark, sf).collect()
    assert(out.nonEmpty)
    val n = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))).count()
    out.take(5).foreach { r =>
      val (cxy, cx, cy, pmi) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      val want = BigDecimal(math.log(n.toDouble * cxy / (cx.toDouble * cy)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(pmi - want) < 1e-9)
    }
  }

  test("q88 union-by-name accounts for every order exactly once") {
    val out = SparkEntry.queries("q88_union_by_name")(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
    // the null group is exactly the pre-1998 shard
    val nullRow = out.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) ==
      Tables.orders(spark, sf).filter(year(col("o_orderdate")) <= 1997).count())
  }

  test("q89 unpivot triples the row mass into measures") {
    val out = SparkEntry.queries("q89_unpivot")(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum == 3 * Tables.lineitem(spark, sf).count())
    assert(out.map(_.getString(1)).distinct.sorted.toSeq ==
      Seq("l_discount", "l_extendedprice", "l_quantity"))
  }

  test("q90 SQL facade: every returned customer has a qualifying order") {
    val out = SparkEntry.queries("q90_sql_correlated")(spark, sf)
    val bad = out.join(
      Tables.orders(spark, sf).filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("c_custkey")).distinct(),
      Seq("c_custkey"), "left_anti").count()
    assert(bad == 0)
  }
}
