package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row signature kernels (MinHash / SimHash) over a
  * shingle array.
  *
  * A document signature is a pure scalar function of its shingle set,
  * so it belongs in the map stage as ONE expression — not as an
  * explode + k grouped aggregates (round-1's shape, which shuffled an
  * exploded row per shingle and spent ~16 s of one-time codegen/JIT on
  * a 128-buffer HashAggregate), and not as nested HOFs (which
  * re-evaluate the inner array per outer element, interpreted). The
  * plain-Java double loop below is ~shingles × k long-ops per row
  * (µs), keeps the whole dedup blocking pipeline shuffle-free until
  * the (id, band-key) explode, and needs no aggregation state at all.
  *
  * Hash parity: per-shingle base hash is Spark's own `xxhash64` (seed
  * 42, via catalyst XXH64), and the affine permutation / bit-vote
  * arithmetic replicates the previous aggregate formulation
  * bit-for-bit — signatures are byte-identical to round 2's, so specs
  * and planted-pair semantics carry over unchanged.
  */
object SigExpressions {
  /** Spark's xxhash64 default seed. */
  val XxSeed = 42L
}

/** MinHash signature: `array<long>` of length k — min over shingles of
  * the i-th affine permutation of the shingle hash, in Z/(2^31-1).
  * Null for an empty shingle array (no signature ≙ the old explode
  * pipeline emitting no rows for that doc).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  @transient private lazy val (pa, pb) = {
    val (a, b) = Hashing.affineSeeds(k)
    (a.toArray, b.toArray)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else MinHashSig.compute(arr, pa, pb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val paRef = ctx.addReferenceObj("pa", pa, "long[]")
    val pbRef = ctx.addReferenceObj("pb", pb, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($c.numElements() == 0) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.MinHashSig.compute($c, $paRef, $pbRef);
      |}""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Static kernel shared by interpreted eval and generated code
    * (called from whole-stage codegen via the companion's static
    * forwarder). Caller guarantees a non-empty array.
    */
  def compute(arr: ArrayData, pa: Array[Long], pb: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val k = pa.length
    val p = Hashing.MinHashPrime
    val out = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      // pmod(xxhash64(s), p): 31-bit reduced hash → 62-bit products
      val hm = java.lang.Math.floorMod(XXH64.hashUTF8String(s, SigExpressions.XxSeed), p)
      var i = 0
      while (i < k) {
        val v = java.lang.Math.floorMod(hm * pa(i) + pb(i), p)
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Word n-grams as one native pass: array<string> tokens → array of
  * space-joined n-grams. Replaces the `transform(sequence, slice +
  * concat_ws)` HOF formulation, whose per-element lambda interprets a
  * slice + varargs-concat expression tree per position — measured
  * ~4.6 s for the sf0.1 shingle pass vs ~0.6 s here (it sat under
  * every dedup/fingerprint/decontamination query). Fewer than n
  * tokens → empty array (call sites pre-filter, so outputs are
  * unchanged where defined; the HOF's size<n behavior was an ANSI
  * slice(0) error, never reachable).
  */
case class WordNGramsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(v: Any): Any =
    WordNGramsExpr.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNGramsExpr.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGramsExpr {
  private val Space = UTF8String.fromString(" ")

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](len - n + 1)
    val parts = new Array[UTF8String](2 * n - 1)
    i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        parts(2 * j) = toks(i + j)
        if (j < n - 1) parts(2 * j + 1) = Space
        j += 1
      }
      out(i) = UTF8String.concat(parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Canonical word tokenizer as one native pass, value-identical to
  * `split(regexp_replace(trim(lower(text)), "\\s+", " "), " ")` — the
  * tokenize chain every text/dedup query begins with (three regex/
  * string passes collapsed into one byte scan). The contortions of
  * the original chain are reproduced exactly:
  *  - `lower` via UTF8String.toLowerCase (what Spark's Lower does);
  *  - `trim` strips ONLY 0x20 spaces (Spark's StringTrim default);
  *  - whitespace = Java regex `\s` = the six ASCII chars
  *    [ \t\n\x0B\f\r]; runs collapse to one separator;
  *  - a run of non-space whitespace touching the (space-trimmed)
  *    string edge yields an EMPTY edge token, and an empty/all-space
  *    input yields [""] — both exactly what replace-then-split does.
  */
case class TokenizeExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokenize"

  override def nullSafeEval(v: Any): Any =
    TokenizeExpr.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenizeExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenizeExpr {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(v: UTF8String): ArrayData = {
    val lowered = v.toLowerCase
    val bytes = lowered.getBytes
    var i = 0
    var j = bytes.length
    while (i < j && bytes(i) == ' ') i += 1
    while (j > i && bytes(j - 1) == ' ') j -= 1
    if (i == j) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = i
    var k = i
    while (k < j) {
      if (isWs(bytes(k))) {
        out += UTF8String.fromBytes(bytes, start, k - start)
        while (k < j && isWs(bytes(k))) k += 1
        start = k
      } else k += 1
    }
    out += UTF8String.fromBytes(bytes, start, j - start)
    new GenericArrayData(out.toArray)
  }
}

/** SimHash code: 64-bit long — bit i set iff the Σ±1 vote of bit i
  * over all shingle hashes is ≥ 0. Null for an empty shingle array.
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else SimHashSig.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($c.numElements() == 0) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.SimHashSig.compute($c);
      |}""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSig {
  /** Static kernel shared by interpreted eval and generated code.
    * Caller guarantees a non-empty array; returns the primitive code
    * (no boxing on the codegen path).
    */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(j), SigExpressions.XxSeed)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) != 0L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var code = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) >= 0) code |= (1L << i)
      i += 1
    }
    code
  }
}
