package graft

import graft.functions.CosineSim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("CosineSim expression matches scala computation, handles zero/null") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val got = df.select(CosineSim(col("a"), col("b")).as("c")).collect()
    assert(math.abs(got(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(got(1).getDouble(0) - 0.0) < 1e-12)
    assert(math.abs(got(2).getDouble(0) - 1.0) < 1e-12)
    assert(got(3).isNullAt(0)) // zero-norm → null
  }

  /** The loader must probe the stored element type: `ArrayData
    * .getFloat` over a double-backed array returns garbage WITHOUT
    * throwing, so an `array<double>` regeneration (the testdata has
    * changed layout twice in round 8 alone) would silently corrupt
    * every similarity. The probe casts down at the source.
    */
  test("Tables.embeddings adapts an array<double> layout to the float kernels") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_emb_probe")
    Seq((0L, Array(1.0, 0.0)), (1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(dir.resolve("embeddings.parquet").toString)
    val emb = Tables.embeddings(spark, dir.toString)
    assert(emb.schema("embedding").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))
    val cos = emb.as("x").join(emb.as("y"),
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id"),
        CosineSim(col("x.embedding"), col("y.embedding")).as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(cos((0L, 1L)) - 1.0) < 1e-12)
    assert(math.abs(cos((0L, 2L)) - 0.0) < 1e-12)
  }

  /** In-memory exact top-k (ground truth). */
  private lazy val bruteTopK: Map[Long, Seq[Long]] = {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      d / math.sqrt(nx * ny)
    }
    vecs.filter(_._1 < 10).map { case (qid, q) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (vid, v) => (vid, cos(q, v)) }
        .sortBy { case (vid, c) => (-c, vid) }
        .take(AnnQueriesK).map(_._1).toSeq
    }.toMap
  }
  private val AnnQueriesK = graft.queries.AnnQueries.K

  test("q39 brute-force top-k matches in-memory ground truth exactly") {
    val got = SparkEntry.queries("q39_ann_brute")(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
      }
    assert(got.keySet === bruteTopK.keySet)
    got.foreach { case (q, ids) => assert(ids === bruteTopK(q), s"query $q") }
  }

  test("q51 IVF ANN: recall@10 vs brute force is meaningfully above random") {
    val got = SparkEntry.queries("q51_ann_ivf")(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }
    val recalls = bruteTopK.map { case (q, truth) =>
      got.get(q).map(c => truth.count(c.contains).toDouble / truth.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // nprobe/cells = 4/16 of the corpus scanned; embeddings are noise
    // so recall ≈ coverage fraction; require clearly above random-10.
    assert(mean >= 0.15, f"mean recall@10 = $mean%.3f")
  }

  /** Scale guard (r9, VERDICT r8 #1): the fit sample's driver collect
    * must be bounded by a fixed ROW COUNT, not a corpus fraction — a
    * fractional sample is ~25 TB through the driver at 100 TB. The
    * hash-ordered limit plans as TakeOrderedAndProject: each scan
    * partition keeps ≤ SampleCap rows in a heap, the driver merges.
    */
  test("q51 IVF fit sample is row-capped (TakeOrderedAndProject), not corpus-fractional") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val sample = graft.queries.IvfAnn.fitSample(emb)
    val phys = sample.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      s"fit sample must plan as a bounded top-k, got:\n$phys")
    assert(sample.count() <= graft.queries.IvfAnn.SampleCap)
    // The (xxhash64(vec_id), vec_id) ordering is TOTAL, so the sample —
    // set AND order — must be identical under any input partitioning
    // (the index, hence every q51 answer, is partitioning-invariant).
    val a = graft.queries.IvfAnn.fitSample(emb)
      .collect().map(_.getSeq[Float](0))
    val b = graft.queries.IvfAnn.fitSample(emb.repartition(13))
      .collect().map(_.getSeq[Float](0))
    assert(a.toSeq === b.toSeq, "fit sample must be partitioning-invariant")
  }

  test("q40 LSH ANN: recall@10 vs brute force is meaningfully above random") {
    val got = SparkEntry.queries("q40_ann_lsh")(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }
    val recalls = bruteTopK.map { case (q, truth) =>
      got.get(q).map(c => truth.count(c.contains).toDouble / truth.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // random 10-of-499 baseline ≈ 0.02; require well above that
    assert(mean >= 0.10, f"mean recall@10 = $mean%.3f")
  }
}
