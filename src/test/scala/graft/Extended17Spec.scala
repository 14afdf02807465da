package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for q113–q114 (oracle hashes are the primary gate). */
class Extended17Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("q113 extracted spans really match their pattern, ordinals dense") {
    val out = SparkEntry.queries("q113_pattern_extract")(spark, sf)
      .limit(500).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (kind, m) = (r.getString(1), r.getString(3))
      kind match {
        case "long_word" => assert(m.matches("[a-z]{7,}"))
        case "vowel_run" => assert(m.matches("[aeiou]{2,}"))
      }
    }
    // ordinals are dense from 0 within (doc, kind)
    out.groupBy(r => (r.getLong(0), r.getString(1))).foreach {
      case (_, rows) =>
        val idx = rows.map(_.getInt(2)).sorted.toSeq
        assert(idx == (0 until idx.length))
    }
  }

  test("q114 lateral top-2 equals a window-rank formulation") {
    val out = SparkEntry.queries("q114_lateral")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = Tables.customer(spark, sf)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_custs"))
    val ranked = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf),
        col("n_regionkey") === col("r_regionkey"))
      .join(counts, col("c_nationkey") === col("n_nationkey"), "left")
      .na.fill(0, Seq("n_custs"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("r_name")
          .orderBy(col("n_custs").desc, col("n_name"))))
      .filter(col("rk") <= 2)
      .select("r_name", "n_name").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.sorted.toSeq == ranked.sorted.toSeq)
  }
}
