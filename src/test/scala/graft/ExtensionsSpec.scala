package graft

import graft.plans.GraftExtensions
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("cosine_sim and srp_code are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       srp_code(array(CAST(1.0 AS FLOAT), CAST(0.5 AS FLOAT)), 4, 6) AS code
        |""".stripMargin).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getSeq[Int](1).length === 4)
  }

  test("graft_tokenize and word_ngrams are callable from SQL, match Column API") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    import graft.functions.{TextFunctions => T}
    val sqlOut = spark.sql(
      """SELECT word_ngrams(graft_tokenize('The  quick Brown fox'), 2) AS g"""
    ).collect().head.getSeq[String](0).toList
    assert(sqlOut == List("the quick", "quick brown", "brown fox"))
    val viaCols = Tables.documents(spark, SparkTestSession.sf).limit(10)
      .select(T.wordNGrams(T.tokens(col("text")), 2).as("g"))
      .collect().map(_.getSeq[String](0).toList)
    Tables.documents(spark, SparkTestSession.sf).limit(10)
      .createOrReplaceTempView("docs10")
    val viaSql = spark.sql(
      "SELECT word_ngrams(graft_tokenize(text), 2) AS g FROM docs10")
      .collect().map(_.getSeq[String](0).toList)
    assert(viaCols.toSeq == viaSql.toSeq)
  }

  test("minhash_sig and simhash_sig SQL output matches the DataFrame stages") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    import graft.functions.{Hashing, TextFunctions => T}
    val docs = Tables.documents(spark, SparkTestSession.sf).limit(20)
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(T.wordNGrams(col("toks"), 2)).as("shingles"))
      .filter(size(col("shingles")) >= 1)
    docs.createOrReplaceTempView("sig_spec_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, minhash_sig(shingles, 128) AS sig,
        |       simhash_sig(shingles) AS sim
        |FROM sig_spec_docs""".stripMargin)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    val sigs = Hashing.minHashSignatures(docs, "doc_id", "shingles", 128)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sims = Hashing.simHashes(docs, "doc_id", "shingles")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.dropTempView("sig_spec_docs")
    assert(viaSql.nonEmpty)
    assert(viaSql.map { case (id, (s, _)) => id -> s } === sigs)
    assert(viaSql.map { case (id, (_, m)) => id -> m } === sims)
  }

  test("srp_code SQL output matches the Column API expression") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val df = Tables.embeddings(spark, SparkTestSession.sf).limit(20)
    val viaSql = df.selectExpr("vec_id", "srp_code(embedding, 4, 6) AS c")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val viaApi = df.select(col("vec_id"),
        graft.queries.Lsh.srpCodes(col("embedding"), 4, 6).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(viaSql === viaApi)
  }
}
