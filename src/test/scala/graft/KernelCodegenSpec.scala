package graft

import graft.functions.{CosineSim, Hashing, NearestCell, SrpCode, TextFunctions => T}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the native kernels' generated code COMPILES and runs inside
  * whole-stage codegen — not just that results are right. With
  * `spark.sql.codegen.fallback=false`, a janino compile failure in any
  * kernel's `doGenCode` throws instead of silently degrading to the
  * interpreted path (which would keep results correct but erase the
  * codegen win without any test noticing).
  */
class KernelCodegenSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def withStrictCodegen[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try f finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("text/sig kernels compile and run under strict whole-stage codegen") {
    withStrictCodegen {
      val docs = Seq(
        (1L, "The  quick brown fox\tjumps over the lazy dog"),
        (2L, "  "),
        (3L, "one"),
        (4L, "alpha beta gamma alpha beta")).toDF("id", "text")

      val shingled = docs.select(
        $"id", T.wordNGrams(T.tokens($"text"), 2).as("shingles"))
      val sigs = Hashing.minHashSignatures(shingled, "id", "shingles", k = 16)
      val sims = Hashing.simHashes(shingled, "id", "shingles")

      // empty-shingle docs (id 2/3 tokenize to <2 tokens) must drop
      assert(sigs.count() === 2)
      assert(sigs.select($"id", element_at($"sig", 1)).collect().length === 2)
      assert(sims.count() === 2)
    }
  }

  test("vector kernels compile and run under strict whole-stage codegen") {
    withStrictCodegen {
      val vecs = Seq(
        (1L, Array(1.0f, 0.0f, 2.0f)),
        (2L, Array(0.5f, -1.0f, 0.0f))).toDF("id", "emb")
      val centers = Array(Array(1.0f, 0.0f, 2.0f), Array(0.0f, -1.0f, 0.0f))
      val out = vecs
        .select($"id", SrpCode($"emb", tables = 2, bits = 4).as("codes"),
          CosineSim($"emb", $"emb").as("self"),
          NearestCell($"emb", centers).as("cell"))
        .collect()
      assert(out.length === 2)
      assert(out.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-6))
      assert(out.forall(r => r.getSeq[Int](1).length == 2))
      // row 1 IS centers(0) → cell 0; row 2 is nearer centers(1)
      assert(out.map(r => (r.getLong(0), r.getInt(3))).toMap ===
        Map(1L -> 0, 2L -> 1))
    }
  }

  test("interpreted eval equals codegen results (MinHash/SimHash parity)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog every day"),
      (2L, "pack my box with five dozen liquor jugs right now")).toDF("id", "text")
    val shingled = docs.select(
      $"id", T.wordNGrams(T.tokens($"text"), 2).as("shingles"))

    def run(): Array[(Long, Seq[Long], Long)] = {
      val sig = Hashing.minHashSignatures(shingled, "id", "shingles", k = 8)
      val sim = Hashing.simHashes(shingled, "id", "shingles")
      sig.join(sim, "id").as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
    }

    val prev = spark.conf.get("spark.sql.wholeStageCodegen.enabled", "true")
    val codegen = run()
    spark.conf.set("spark.sql.wholeStageCodegen.enabled", "false")
    val interpreted = try run()
    finally spark.conf.set("spark.sql.wholeStageCodegen.enabled", prev)
    assert(codegen.toSeq === interpreted.toSeq)
  }
}
