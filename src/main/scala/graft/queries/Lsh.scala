package graft.queries

import graft.functions.SrpCode
import org.apache.spark.sql.Column

/** Signed-random-projection (hyperplane) LSH for cosine similarity.
  *
  * Two unit vectors at angle θ land on the same side of a random
  * hyperplane with prob 1-θ/π; a b-bit code collides with prob
  * (1-θ/π)^b, amplified across t independent tables. Codes are built
  * from fixed-seed Gaussian hyperplanes → fully deterministic.
  *
  * Implementation: [[graft.functions.SrpCode]], a native expression
  * (plain-Java dot loops; the HOF formulation was ~1000× slower
  * interpreted).
  */
object Lsh {
  /** `array<int>` of length `tables`: the b-bit bucket code of the
    * embedding in each table.
    */
  def srpCodes(emb: Column, tables: Int, bits: Int): Column =
    SrpCode(emb, tables, bits)
}
