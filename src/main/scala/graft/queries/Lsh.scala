package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Signed-random-projection (hyperplane) LSH for cosine similarity.
  *
  * Two unit vectors at angle θ land on the same side of a random
  * hyperplane with prob 1-θ/π; a b-bit code collides with prob
  * (1-θ/π)^b, amplified across t independent tables. Codes are built
  * from fixed-seed Gaussian hyperplanes → fully deterministic.
  */
object Lsh {

  /** Max supported embedding dimension for the pre-generated planes. */
  val MaxDim = 256

  private def hyperplanes(tables: Int, bits: Int): Array[Array[Array[Double]]] = {
    val rnd = new java.util.Random(0xA11CE5L)
    Array.fill(tables, bits, MaxDim)(rnd.nextGaussian())
  }

  /** `array<int>` of length `tables`: the b-bit bucket code of the
    * embedding in each table. Pure column expressions (no UDF); at
    * larger scale this moves into a codegen'd Expression like
    * [[graft.functions.CosineSim]] — the join/blocking shape stays
    * identical.
    */
  def srpCodes(emb: Column, tables: Int, bits: Int): Column = {
    val hp = hyperplanes(tables, bits)
    val codes = (0 until tables).map { t =>
      (0 until bits).map { j =>
        val w = typedlit(hp(t)(j).toSeq)
        val dot = aggregate(
          zip_with(emb, slice(w, lit(1), size(emb)), (x, wt) => x * wt),
          lit(0.0), (acc, v) => acc + v)
        when(dot >= 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
    }
    array(codes: _*)
  }
}
