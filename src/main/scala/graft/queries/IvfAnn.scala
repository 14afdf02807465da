package graft.queries

import graft.Tables
import graft.functions.CosineSim
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the standard
  * 100 TB scale path for similarity search (SURVEY.md §2 q51).
  *
  * Index (one-time, decoupled from the query):
  *  - the coarse quantizer is fit on a bounded deterministic SAMPLE of
  *    the corpus (k-means needs only enough points to place k
  *    centroids — fitting on all of 100 TB would be an unbounded
  *    training job inside a query);
  *  - every vector is assigned to its nearest centroid cell in one
  *    scan, and the assignment is persisted and memoized per corpus
  *    dir (at real scale this is a write-once bucketed/partitioned
  *    table keyed by cell, cf. Sources.writeBucketed).
  *
  * Search: a query probes only its `nprobe` nearest cells — the
  * corpus join is an equi-join on cell id over ~nprobe/k of the data,
  * instead of a full scan. Exact cosine re-rank inside the probed
  * cells.
  */
object IvfAnn {

  val K = 10         // neighbors returned
  val Cells = 16     // coarse centroids
  val NProbe = 4     // cells probed per query
  val SampleMod = 4  // deterministic 1-in-4 sample for the fit

  /** Memoized per corpus dir: (assigned vectors persisted, centroids). */
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, (DataFrame, Array[Array[Double]])]()

  /** Build (or fetch) the IVF index for a corpus dir. */
  def index(s: SparkSession, dir: String): (DataFrame, Array[Array[Double]]) =
    indexCache.computeIfAbsent(dir, { _ =>
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        .withColumn("features", array_to_vector(col("embedding")))
      // Deterministic hash-sample for the fit: bounded training set,
      // stable across runs/partitionings (unlike .sample at scale).
      val fitSample = emb
        .filter(pmod(xxhash64(col("vec_id")), lit(SampleMod)) === 0)
      // Each one-time index phase is a RoundStats stage (cf. the dedup
      // family): q51's in-suite wall is ~all cold index build, and the
      // bench stages map should say whether the k-means fit or the
      // assignment scan paid it.
      val model = graft.RoundStats.timed("ivf_fit") {
        new KMeans()
          .setK(Cells).setSeed(7L).setFeaturesCol("features")
          .setPredictionCol("cell")
          .setMaxIter(8) // coarse quantizer: placement, not convergence
          .fit(fitSample)
      }
      val assigned = graft.RoundStats.timed("ivf_assign") {
        val a = model.transform(emb)
          .select(col("vec_id"), col("embedding"), col("cell"))
          .persist()
        a.count() // materialize once, off the query's critical path
        a
      }
      (assigned, model.clusterCenters.map(_.toArray))
    })

  def q51(s: SparkSession, dir: String): DataFrame = {
    val (assigned, centers) = index(s, dir)

    // Query → nprobe nearest cells (tiny: |queries| × Cells, driver-side)
    val queries = Tables.embeddings(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dist2(x: Array[Double], c: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < math.min(x.length, c.length)) {
        val t = x(i) - c(i); d += t * t; i += 1
      }
      d
    }
    val probes = for {
      (qid, qv) <- queries.toSeq
      cell <- centers.zipWithIndex
        .map { case (c, i) => (dist2(qv, c), i) }
        .sortBy(_._1).take(NProbe).map(_._2)
    } yield (qid, cell)
    import s.implicits._
    val probeDf = probes.toDF("query_id", "cell")
    val queryEmb = Tables.embeddings(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    assigned
      .join(broadcast(probeDf), Seq("cell")) // prune to probed cells
      .join(broadcast(queryEmb), Seq("query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        CosineSim(col("embedding"), col("q_emb")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_ann_ivf" -> (q51 _))
}
