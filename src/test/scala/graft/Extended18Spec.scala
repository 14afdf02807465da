package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for q115–q117 (oracle hashes are the primary gate). */
class Extended18Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("q115 group_concat lists every nation exactly once, sorted") {
    val out = SparkEntry.queries("q115_string_agg")(spark, sf).collect()
    val byRegion = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name").collect()
      .groupBy(_.getString(0)).map { case (r, rows) =>
        r -> rows.map(_.getString(1)).sorted.mkString(",")
      }
    out.foreach { r =>
      assert(r.getString(1) == byRegion(r.getString(0)))
      assert(r.getInt(2) == r.getString(1).split(",").length)
    }
  }

  test("q116 bit aggregates bound each other") {
    val out = SparkEntry.queries("q116_bit_agg")(spark, sf).collect()
    out.foreach { r =>
      val (and, or) = (r.getLong(1), r.getLong(2))
      assert((and & or) == and) // AND ⊆ OR as bit sets
      assert(or < 256 && and >= 0)
    }
  }

  test("q118 quantization: codes span [0,255], extremes map to the rails") {
    val out = SparkEntry.queries("q118_embed_quantize")(spark, sf).collect()
    assert(out.length == Tables.embeddings(spark, sf).count())
    val codes = out.map(r => r.getString(1).stripPrefix("[").stripSuffix("]")
      .split(",").map(_.toInt))
    codes.foreach(cs => cs.foreach(c => assert(c >= 0 && c <= 255)))
    // each dimension's min maps to 0 and max to 255 somewhere
    val dims = codes.head.length
    (0 until dims).foreach { d =>
      val col = codes.map(_(d))
      assert(col.min == 0 && col.max == 255)
    }
  }

  /** Cardinality parity on degenerate rows (ADVICE r8): the oracle's
    * unnest path emits NOTHING for a null/empty embedding, so the
    * map-side transform path must drop them too. The shipped corpus
    * has none — this plants both shapes.
    */
  test("q118 drops null and empty embeddings (oracle unnest parity)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_q118_degen")
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(0L, Seq(0.0f, 1.0f)), Row(1L, Seq(1.0f, 0.0f)),
      Row(2L, null), Row(3L, Seq.empty[Float]))
    spark.createDataFrame(rows, schema).coalesce(1)
      .write.parquet(dir.resolve("embeddings.parquet").toString)
    val out = SparkEntry.queries("q118_embed_quantize")(spark, dir.toString)
      .collect()
    assert(out.map(_.getLong(0)).toSet === Set(0L, 1L),
      "null/empty embeddings must produce no output row")
  }

  test("q119 map HOFs: zipped = 3x base, evens keep only even keys") {
    val out = SparkEntry.queries("q119_map_hofs")(spark, sf)
      .limit(100).collect()
    def entries(j: String): Seq[(Int, Int)] =
      "\"key\":(\\d+),\"value\":(\\d+)".r.findAllMatchIn(j)
        .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
    out.foreach { r =>
      val base = entries(r.getString(1))
      assert(entries(r.getString(4)) == base.map { case (k, v) => (k, v * 3) })
      assert(entries(r.getString(3)) == base.filter(_._1 % 2 == 0))
      assert(entries(r.getString(2)) == base.map { case (k, v) => (k, v * 2) })
    }
  }

  test("q117 mode equals a brute-force count") {
    val vals = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("int")).collect()
      .groupBy(_.getString(0))
    val out = SparkEntry.queries("q117_mode")(spark, sf).collect()
    out.foreach { r =>
      val counts = vals(r.getString(0)).groupBy(_.getInt(1))
        .map { case (q, rs) => (q, rs.length.toLong) }
      val best = counts.toSeq.sortBy { case (q, c) => (-c, q) }.head
      assert(r.getInt(1) == best._1 && r.getLong(2) == best._2)
    }
  }
}
