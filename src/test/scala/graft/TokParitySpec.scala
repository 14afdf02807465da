package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextFunctions => T}

/** The native tokenizer must be VALUE-IDENTICAL to the regex chain it
  * replaced, including the empty-edge-token contortions.
  */
class TokParitySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("TokenizeExpr == split(normText) on adversarial inputs") {
    val cases = Seq("a b c", "  lead", "trail  ", "\ta b", "a b\t", "",
      "   ", "\t\t", "ONE  Two\nthree", "x", " x ", "ab", "Ä Ö ü",
      "a  b   c", "\r\nx\r\n", "tab\tin\tmiddle", "vtab", "mix \t\r mix")
    val df = cases.toDF("t")
    val nat = df.select(T.tokens(col("t"))).collect()
      .map(_.getSeq[String](0).toList)
    val ref = df.select(
        split(regexp_replace(trim(lower(col("t"))), "\\s+", " "), " "))
      .collect().map(_.getSeq[String](0).toList)
    cases.indices.foreach { i =>
      assert(nat(i) == ref(i),
        s"case '${cases(i)}': native=${nat(i)} ref=${ref(i)}")
    }
  }
}
