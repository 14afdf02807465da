package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders (SURVEY.md §2 q30–q33).
  *
  * Everything here is composed from codegen'd built-ins
  * (`org.apache.spark.sql.functions`): zero shuffles, zero UDFs — at
  * 100 TB these are scan-bound map-side expressions.
  */
object TextFunctions {

  /** Canonical form: lowercase, trimmed, whitespace collapsed. */
  def normText(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Word tokens of the canonical form — one native byte-scan pass
    * ([[TokenizeExpr]]), value-identical to `split(normText(c), " ")`
    * (the three-regex chain it replaces; see the kernel's scaladoc
    * for the edge-token contortions it reproduces).
    */
  def tokens(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(TokenizeExpr(GraftSqlBridge.expression(c)))
  }

  /** Whitespace token count via the replace trick — identical
    * semantics in every engine (no regex/split edge cases), used by
    * the DuckDB oracle too.
    */
  def wsTokenCount(c: Column): Column = {
    // collapse runs first, then count single spaces — a run of
    // whitespace is ONE separator
    val norm = regexp_replace(trim(c), "\\s+", " ")
    when(length(norm) === 0, lit(0))
      .otherwise(length(norm) - length(regexp_replace(norm, " ", "")) + 1)
  }

  /** BPE-ish subword proxy: letter runs, digit runs, single
    * punctuation marks — the shape of a byte-pair tokenizer's
    * pre-tokenization split (deterministic + portable regex).
    */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePattern), lit(0)))

  /** Word n-grams (as strings) over the token array — one native
    * kernel pass ([[WordNGramsExpr]]). The previous HOF formulation
    * (`transform(sequence, slice + concat_ws)`) interpreted a slice +
    * concat expression tree per position and additionally re-evaluated
    * an unbound `toks` argument per element; the native expression
    * evaluates its child exactly once, so the old bound-attribute
    * caller contract is gone too.
    */
  def wordNGrams(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      WordNGramsExpr(GraftSqlBridge.expression(toks), n))
  }

  private val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "que", "de", "por"))

  def stopwordCount(toks: Column, lang: String = "en"): Column =
    size(filter(toks, t => t.isInCollection(Stopwords(lang))))

  /** Count of CJK codepoints (BMP unified ideographs). */
  def cjkCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[\\u4e00-\\u9fff]", ""))

  /** Heuristic language ID over {en,de,fr,es,zh}: CJK-density short
    * circuit, else argmax of per-language stopword hits (ties → 'en').
    * NOTE: testdata's `lang` column is a random tag on English word
    * salad — the heuristic is validated on authored samples in
    * `TextSpec` instead.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = Stopwords.keys.toSeq.sorted.map(l => stopwordCount(toks, l).as(l))
    val best = greatest(scores: _*)
    when(cjkCount(text) * 5 > length(text), lit("zh"))
      .when(best === 0, lit("unknown"))
      .otherwise(
        Stopwords.keys.toSeq.sorted.reverse.foldLeft(lit("en")) { (acc, l) =>
          when(stopwordCount(tokens(text), l) === best, lit(l)).otherwise(acc)
        })
  }

  /** Composite quality score in [0,1]-ish: rewards moderate length,
    * low punctuation/digit density, presence of stopwords.
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val words = wsTokenCount(text).cast("double")
    val punct = (length(text) -
      length(regexp_replace(text, "[.,!?;:]", ""))).cast("double")
    val digits = (length(text) -
      length(regexp_replace(text, "[0-9]", ""))).cast("double")
    val sw = stopwordCount(tokens(text)).cast("double")
    val lenScore = least(len / 200.0, lit(1.0))
    val punctPenalty = least(punct / greatest(words, lit(1.0)), lit(1.0))
    val digitPenalty = least(digits / greatest(len, lit(1.0)), lit(1.0))
    val swScore = least(sw / greatest(words, lit(1.0)) * 10.0, lit(1.0))
    (lenScore * 0.4 + swScore * 0.2 +
      (lit(1.0) - punctPenalty) * 0.2 + (lit(1.0) - digitPenalty) * 0.2)
  }
}
