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

  /** Strict codegen AND a real codegen path. fallback=false alone is
    * NOT enough for these local-Seq fixtures: ConvertToLocalRelation
    * folds a deterministic Project over a LocalRelation away at
    * OPTIMIZATION time via interpreted eval — debugCodegen shows
    * "0 WholeStageCodegen subtrees" and doGenCode never runs (found
    * r9: a planted janino Redefinition bug sailed through this gate).
    * Excluding that rule keeps the projection in the physical plan,
    * where it whole-stage-compiles — and now throws on a broken
    * kernel.
    */
  private def withStrictCodegen[A](f: => A): A = {
    val prevFb = spark.conf.get("spark.sql.codegen.fallback", "true")
    val prevEx = spark.conf.get("spark.sql.optimizer.excludedRules", "")
    val rule = "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation"
    spark.conf.set("spark.sql.codegen.fallback", "false")
    // APPEND to any pre-existing exclusions — overwriting would
    // silently re-enable them only inside this block
    spark.conf.set("spark.sql.optimizer.excludedRules",
      if (prevEx.isEmpty) rule else s"$prevEx,$rule")
    try f finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFb)
      if (prevEx.isEmpty) spark.conf.unset("spark.sql.optimizer.excludedRules")
      else spark.conf.set("spark.sql.optimizer.excludedRules", prevEx)
    }
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

  /** Regression (ADVICE r8): with NULLABLE children, nullSafeCodeGen
    * wraps each kernel's block in `if (!isNull) { }` — the braces give
    * every instance its own scope, hiding name collisions. With
    * NON-nullable children there are no braces: all instances share
    * the projection's scope, so locals must come from ctx.freshName or
    * janino fails with "Redefinition of local variable" (verified: the
    * pre-fix kernel fails exactly this test). CreateArray over
    * primitive columns is non-nullable; the expressions are pairwise
    * DISTINCT so common-subexpression elimination cannot collapse
    * them.
    */
  test("distinct vector kernels over non-nullable inputs share one codegen scope") {
    withStrictCodegen {
      val centers = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
      val df = Seq((1.0f, 0.0f), (0.0f, 1.0f)).toDF("x", "y")
        .select(array($"x", $"y").as("v"), array($"y", $"x").as("w"))
      val out = df.select(
          NearestCell($"v", centers).as("cv"),
          NearestCell($"w", centers).as("cw"),
          CosineSim($"v", $"w").as("svw"),
          CosineSim($"w", $"v").as("swv"))
        .collect()
      assert(out.length === 2)
      // row 1: v=(1,0) → cell 0, w=(0,1) → cell 1; orthogonal → cos 0
      assert(out(0).getInt(0) === 0 && out(0).getInt(1) === 1)
      out.foreach { r =>
        assert(math.abs(r.getDouble(2)) < 1e-12)
        assert(r.getDouble(2) === r.getDouble(3))
      }
    }
  }

  /** SortedIntersectCount (r12, the q35/q37 verify kernel): merge-pass
    * |a ∩ b| over sorted distinct long arrays. Two instances share one
    * projection (the verify join computes f_a∩f_b once but the
    * freshName discipline must hold like the other kernels'), plus the
    * empty/disjoint/subset boundary shapes and interpreted parity.
    */
  test("sorted-intersect kernel compiles under strict codegen; boundary shapes") {
    import graft.functions.SortedIntersectCount
    val rows = withStrictCodegen {
      val df = Seq(
        (Array(1L, 3L, 5L, 9L), Array(2L, 3L, 9L, 11L)), // overlap 2
        (Array(1L, 2L), Array(3L, 4L)),                   // disjoint
        (Array.empty[Long], Array(1L, 2L)),               // empty side
        (Array(4L, 7L, 8L), Array(4L, 7L, 8L))            // identical
      ).toDF("a", "b")
      df.select(
          SortedIntersectCount($"a", $"b").as("ab"),
          SortedIntersectCount($"b", $"a").as("ba"))
        .collect()
    }
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 0L, 0L, 3L))
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), "not symmetric"))
    // interpreted parity: evaluate off the codegen path via a filter
    // over non-codegen context is overkill — call nullSafeEval directly
    val e = graft.functions.SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.default(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.default(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    def arr(xs: Long*) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(xs.toArray)
    assert(e.nullSafeEval(arr(1L, 3L, 5L, 9L), arr(2L, 3L, 9L, 11L)) === 2L)
    assert(e.nullSafeEval(arr(), arr(1L)) === 0L)
    assert(e.nullSafeEval(arr(4L, 7L, 8L), arr(4L, 7L, 8L)) === 3L)
  }

  /** ADVICE r12: the kernel's TYPE contract is enforced at analysis —
    * a call site feeding anything but null-element-free array<bigint>
    * (where getLong would read garbage and silently skew Jaccard)
    * fails loudly instead of miscounting.
    */
  test("sorted-intersect kernel rejects non-long / null-element arrays") {
    import graft.functions.SortedIntersectCount
    val strings = Seq((Array("a"), Array("b"))).toDF("a", "b")
    val ex1 = intercept[org.apache.spark.sql.AnalysisException] {
      strings.select(SortedIntersectCount($"a", $"b")).collect()
    }
    assert(ex1.getMessage.contains("sorted_intersect_count"))
    // boxed Option[Long] elements infer containsNull = true
    val nullable = Seq((Array(Option(1L), None), Array(Option(1L))))
      .toDF("a", "b")
    val ex2 = intercept[org.apache.spark.sql.AnalysisException] {
      nullable.select(SortedIntersectCount($"a", $"b")).collect()
    }
    assert(ex2.getMessage.contains("sorted_intersect_count"))
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

    // codegen leg under withStrictCodegen: without the
    // ConvertToLocalRelation exclusion BOTH legs of this comparison
    // folded to interpreted eval at optimization time (r9 finding) —
    // the parity assert compared interpreted against interpreted.
    val codegen = withStrictCodegen { run() }
    val prev = spark.conf.get("spark.sql.wholeStageCodegen.enabled", "true")
    spark.conf.set("spark.sql.wholeStageCodegen.enabled", "false")
    val interpreted = try run()
    finally spark.conf.set("spark.sql.wholeStageCodegen.enabled", prev)
    assert(codegen.toSeq === interpreted.toSeq)
  }

  test("NearestCell: interpreted ≡ codegen; ties go to the lowest index") {
    // 64 seeded random vectors against 4 centers, plus an exact-tie
    // vector equidistant from centers 1 and 2 (must pick 1).
    val rng = new scala.util.Random(11)
    val centers = Array(
      Array(0.0f, 0.0f), Array(2.0f, 0.0f), Array(0.0f, 2.0f),
      Array(5.0f, 5.0f))
    val vecs = (1 to 64).map(i =>
      (i.toLong, Array(rng.nextFloat() * 6, rng.nextFloat() * 6))) :+
      (999L, Array(1.0f, 1.0f)) // d² = 2 to centers 1 AND 2 (and 0)
    val df = vecs.toDF("id", "emb")
    def run(): Map[Long, Int] = df
      .select($"id", NearestCell($"emb", centers).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // codegen leg under withStrictCodegen (see the parity test above:
    // both legs otherwise fold to interpreted eval)
    val codegen = withStrictCodegen { run() }
    val prev = spark.conf.get("spark.sql.wholeStageCodegen.enabled", "true")
    spark.conf.set("spark.sql.wholeStageCodegen.enabled", "false")
    val interpreted = try run()
    finally spark.conf.set("spark.sql.wholeStageCodegen.enabled", prev)
    assert(codegen === interpreted)
    assert(codegen(999L) === 0, "tie must resolve to the LOWEST index")
    // parity with a scala reference argmin
    val ref = vecs.map { case (id, v) =>
      id -> centers.zipWithIndex.minBy { case (c, i) =>
        (math.pow(v(0) - c(0), 2) + math.pow(v(1) - c(1), 2), i)
      }._2
    }.toMap
    assert(codegen === ref)
  }

  test("localKMeans is seed-deterministic and handles k > n and duplicates") {
    val pts = Array(
      Array(0.0f, 0.0f), Array(0.1f, 0.0f),
      Array(10.0f, 10.0f), Array(10.1f, 10.0f))
    val a = graft.queries.IvfAnn.localKMeans(pts, k = 2, iters = 4, seed = 7L)
    val b = graft.queries.IvfAnn.localKMeans(pts, k = 2, iters = 4, seed = 7L)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq, "same seed, same centers")
    // the two obvious clusters must be found (one center near each)
    assert(a.exists(c => math.abs(c(0) - 0.05f) < 0.5), s"missing low cluster")
    assert(a.exists(c => math.abs(c(0) - 10.05f) < 0.5), s"missing high cluster")
    // k > n degrades to n effective centers without throwing
    val small = graft.queries.IvfAnn.localKMeans(
      Array(Array(1.0f), Array(2.0f)), k = 16, iters = 2, seed = 1L)
    assert(small.length === 2)
    // an all-identical sample (zero total distance in the ++ seeding)
    val dup = graft.queries.IvfAnn.localKMeans(
      Array.fill(5)(Array(3.0f, 3.0f)), k = 3, iters = 2, seed = 1L)
    assert(dup.nonEmpty && dup.forall(c => c(0) == 3.0f && c(1) == 3.0f))
  }
}
