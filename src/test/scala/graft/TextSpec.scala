package graft

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  import spark.implicits._

  test("langId identifies authored samples (testdata lang col is a random tag)") {
    val samples = Seq(
      ("the cat is in the house and it is warm", "en"),
      ("der Hund ist nicht mit der Katze und das ist gut", "de"),
      ("le chat est dans la maison et les chiens pour un jour", "fr"),
      ("el gato es un animal que vive en la casa por la noche", "es"),
      ("这是一个中文句子用来测试语言识别", "zh")).toDF("text", "expected")
    val got = samples.select(col("expected"), T.langId(col("text")).as("pred"))
      .collect()
    got.foreach(r =>
      assert(r.getString(0) === r.getString(1),
        s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("WordNGramsExpr: values equal the HOF formulation; size<n is empty") {
    val df = Seq(
      Seq("a", "b", "c", "d"),
      Seq("x", "y"),
      Seq("solo"),
      Seq.empty[String]).toDF("toks")
    // native kernel
    val native = df.select(T.wordNGrams(col("toks"), 2).as("g"))
      .collect().map(_.getSeq[String](0).toList)
    assert(native(0) == List("a b", "b c", "c d"))
    assert(native(1) == List("x y"))
    assert(native(2) == Nil) // size < n → empty (HOF errored here)
    assert(native(3) == Nil)
    // parity with the HOF it replaced, where the HOF is defined
    val hof = df.filter(size(col("toks")) >= 3)
      .select(transform(
        sequence(lit(0), greatest(size(col("toks")) - 2, lit(-1))),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(2)))).as("g"))
      .collect().map(_.getSeq[String](0).toList)
    assert(hof(0) == native(0))
    // trigrams
    val tri = df.select(T.wordNGrams(col("toks"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toList)
    assert(tri(0) == List("a b c", "b c d"))
    assert(tri(1) == Nil)
  }

  test("token counts: whitespace trick equals split semantics on normal text") {
    val df = Seq("one two three", "  padded   spaces  ", "single", "")
      .toDF("text")
    val rows = df.select(
      T.wsTokenCount(col("text")).as("n"),
      size(split(trim(col("text")), "\\s+")).as("m"),
      col("text")).collect()
    rows.filter(_.getAs[String]("text").trim.nonEmpty).foreach { r =>
      assert(r.getAs[Int]("n") === r.getAs[Int]("m"), r.getAs[String]("text"))
    }
    assert(rows.find(_.getAs[String]("text").isEmpty).get.getAs[Int]("n") === 0)
  }

  test("bpe-ish token count splits letters/digits/punct") {
    val rows = Seq("abc123!x y", "hello, world.").toDF("text")
      .select(T.bpeTokenCount(col("text")).as("n")).collect()
    // "abc","123","!","x","y" = 5 ; "hello",",","world","." = 4
    assert(rows.map(_.getInt(0)).toSeq === Seq(5, 4))
  }

  test("quality score is deterministic and in [0,1]") {
    val a = SparkEntry.queries("q30_text_quality")(spark, sf).collect()
    val b = SparkEntry.queries("q30_text_quality")(spark, sf).collect()
    assert(a.sameElements(b))
    val scores = Tables.documents(spark, sf)
      .select(T.qualityScore(col("text")).as("q")).collect()
    assert(scores.forall(r => r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
  }

  /** The fingerprint VALUES (content hash / k-min sketch / SimHash):
    * deterministic across runs, distinct for distinct docs. (q33's
    * query entry is the contract view over these — tested below — so
    * the raw codes are asserted here from the same expressions.)
    */
  test("fingerprints are deterministic and distinct for distinct docs") {
    import org.apache.spark.sql.GraftSqlBridge
    def fingerprints() = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), T.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        xxhash64(T.normText(col("text"))).as("content_hash"),
        to_json(graft.functions.Hashing.kMinSketch(
          graft.functions.Hashing.shingleHashes(
            array_distinct(T.wordNGrams(col("toks"), 3))), 8)).as("kmin"),
        coalesce(GraftSqlBridge.column(graft.functions.SimHashSig(
          GraftSqlBridge.expression(col("toks")))), lit(0L)).as("simhash"))
      .orderBy("doc_id")
    val fp = fingerprints().collect()
    val hashes = fp.map(_.getAs[Long]("content_hash"))
    assert(hashes.distinct.length === hashes.length) // all 500 texts distinct
    val fp2 = fingerprints().collect()
    assert(fp.map(_.getAs[Long]("simhash")).toSeq ===
      fp2.map(_.getAs[Long]("simhash")).toSeq)
    assert(fp.map(_.getAs[String]("kmin")).toSeq ===
      fp2.map(_.getAs[String]("kmin")).toSeq)
  }

  test("q33 contract view: consistency booleans hold, copies counted") {
    val rows = SparkEntry.queries("q33_fingerprint")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("hash_ok")), "content-hash inconsistency")
    assert(rows.forall(_.getAs[Boolean]("kmin_ok")), "k-min sketch inconsistency")
    assert(rows.forall(_.getAs[Boolean]("simhash_ok")), "simhash inconsistency")
    // sf0.01 corpus: all 500 texts distinct (q34's invariant)
    assert(rows.forall(_.getAs[Long]("n_copies") === 1L))
    assert(rows.forall { r =>
      val len = r.getAs[Int]("sketch_len"); len >= 0 && len <= 8
    })
  }
}
