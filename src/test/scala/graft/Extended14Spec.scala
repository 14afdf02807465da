package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for q102–q108 (oracle hashes are the primary gate). */
class Extended14Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("q102 clusters are consistent with the pair graph") {
    val pairs = SparkEntry.queries("q35_dedup_minhash")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = SparkEntry.queries("q102_dedup_cluster")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every edge's endpoints land in the same cluster
    pairs.foreach { case (a, b) => assert(clusters(a) == clusters(b)) }
    // cluster id is the min member (canonical keeper is a member)
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
    }
    // every clustered doc appears in some pair
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(clusters.keySet == inPairs)
  }

  test("q102 transitive chains merge into one cluster") {
    import spark.implicits._
    // authored chain A~B, B~C (never A~C directly) must yield one
    // cluster labelled A — exercised through the same label loop by
    // running propagation on a hand-built edge list
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val nbr = edges.union(edges.select(col("b"), col("a"))).toDF("id", "nb")
    var labels = nbr.select(col("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    var changed = 1L
    while (changed > 0) {
      val next = labels
        .union(nbr.join(labels.select(col("id").as("nb"), col("lbl")), "nb")
          .select(col("id"), col("lbl")))
        .groupBy("id").agg(min("lbl").as("lbl"))
      changed = next.join(labels.withColumnRenamed("lbl", "prev"), "id")
        .filter(col("lbl") =!= col("prev")).count()
      labels = next.localCheckpoint()
    }
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(10L) == 10L && got(11L) == 10L)
  }

  test("q111 apply: kept set = corpus minus exact copies minus non-keepers") {
    val total = Tables.documents(spark, sf).count()
    val kept = SparkEntry.queries("q111_dedup_apply")(spark, sf).collect()
    val report = SparkEntry.queries("q112_dedup_report")(spark, sf)
      .collect().head
    assert(report.getLong(0) == total)
    assert(report.getLong(4) == kept.length.toLong)
    // kept docs contain every cluster keeper and no non-keeper
    val clusters = SparkEntry.queries("q102_dedup_cluster")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val keptIds = kept.map(_.getLong(0)).toSet
    clusters.foreach { case (id, isKeeper) =>
      if (!isKeeper) assert(!keptIds.contains(id))
    }
    assert(kept.length < total) // testdata has planted dups
  }

  test("q103 funnel stage counts are monotonically non-increasing") {
    val out = SparkEntry.queries("q103_funnel")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = Seq("1_signup", "2_view", "3_click", "4_purchase").map(out)
    assert(n == n.sorted.reverse)
    assert(n.head > 0)
  }

  test("q104 retention: offset 0 covers every user once") {
    val out = SparkEntry.queries("q104_retention")(spark, sf).collect()
    val day0 = out.filter(_.getInt(1) == 0).map(_.getLong(2)).sum
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(day0 == users)
    out.foreach(r => assert(r.getInt(1) >= 0))
  }

  test("q105 top-3 orders are the true per-customer top by price") {
    val out = SparkEntry.queries("q105_struct_topn")(spark, sf)
      .limit(50).collect()
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice").collect()
      .groupBy(_.getLong(0))
    out.foreach { r =>
      val exp = orders(r.getLong(0)).sortBy(x => (-x.getDouble(2), -x.getLong(1)))
        .take(3).map(_.getLong(1)).mkString("[", ",", "]")
      assert(r.getString(1) == exp)
    }
  }

  test("q106 z-scores: all survivors are genuine >=2.5-sigma rows") {
    val out = SparkEntry.queries("q106_outlier_zscore")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(math.abs(r.getDouble(3)) >= 2.5))
    // recompute one group's moments independently
    val stats = Tables.events(spark, sf).filter(col("event_type") === "click")
      .agg(avg("value"), stddev_samp("value")).collect().head
    val (mu, sd) = (stats.getDouble(0), stats.getDouble(1))
    out.filter(_.getString(1) == "click").foreach { r =>
      val z = (r.getDouble(2) - mu) / sd
      assert(math.abs(BigDecimal(z).setScale(3,
        BigDecimal.RoundingMode.HALF_UP).toDouble - r.getDouble(3)) < 1e-9)
    }
  }

  test("q107 grouping sets emit exactly the requested combinations") {
    val out = SparkEntry.queries("q107_grouping_sets")(spark, sf).collect()
    val markers = out.map(r => (r.getInt(4), r.getInt(5))).distinct.sorted.toSeq
    // (0,0)=both, (1,0)=linestatus only, (1,1)=grand total — never (0,1)
    assert(markers == Seq((0, 0), (1, 0), (1, 1)))
    val grand = out.filter(r => r.getInt(4) == 1 && r.getInt(5) == 1)
    assert(grand.length == 1)
    assert(grand.head.getLong(2) == Tables.lineitem(spark, sf).count())
  }

  test("q108 stream-static join equals the batch join") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)
    val streamed = SparkEntry.queries("q108_stream_static_join")(spark, sf)
      .collect().map(key)
    val batch = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .join(Tables.customer(spark, sf),
        col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_nationkey"))
      .orderBy("event_id")
      .collect().map(key)
    assert(streamed.toSeq == batch.toSeq)
  }
}
