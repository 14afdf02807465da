package graft.queries

import graft.Tables
import graft.functions.{Hashing, SimHashSig, TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis queries q30–q33 (SURVEY.md §2). All map-side
  * column expressions — shuffle-free, scan-bound at scale.
  */
object TextQueries {

  // ---------------------------------------------------------------- q30
  /** Quality scoring. The oracle mirrors the same arithmetic with
    * portable SQL (replace-trick counts; regexp_replace for char
    * classes identical across engines).
    */
  private def q30(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val txt = col("text")
    d.select(
        col("doc_id"),
        length(txt).as("n_chars_calc"),
        T.wsTokenCount(txt).as("n_words"),
        (length(txt) - length(regexp_replace(txt, "[.,!?;:]", "")))
          .as("n_punct"),
        (length(txt) - length(regexp_replace(txt, "[0-9]", "")))
          .as("n_digits"),
        (length(txt).cast("double") /
          greatest(T.wsTokenCount(txt), lit(1)).cast("double"))
          .as("chars_per_word"))
      .orderBy("doc_id")
  }

  // whitespace-run word count, portable: collapse \s+ to one space,
  // then spaces+1 (matches TextFunctions.wsTokenCount exactly)
  private val sqlWsCount =
    """CASE WHEN LENGTH(regexp_replace(TRIM(text), '\s+', ' ', 'g')) = 0 THEN 0
      |     ELSE LENGTH(regexp_replace(TRIM(text), '\s+', ' ', 'g'))
      |          - LENGTH(REPLACE(regexp_replace(TRIM(text), '\s+', ' ', 'g'), ' ', '')) + 1
      |END""".stripMargin

  private val q30Sql =
    s"""SELECT doc_id,
      |  CAST(LENGTH(text) AS INT) AS n_chars_calc,
      |  CAST($sqlWsCount AS INT) AS n_words,
      |  CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INT) AS n_punct,
      |  CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS INT) AS n_digits,
      |  CAST(LENGTH(text) AS DOUBLE) /
      |    CAST(GREATEST($sqlWsCount, 1) AS DOUBLE) AS chars_per_word
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q31
  private def q31(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val txt = col("text")
    d.select(
        col("doc_id"),
        T.wsTokenCount(txt).as("ws_tokens"),
        T.bpeTokenCount(txt).as("bpe_tokens"))
      .orderBy("doc_id")
  }

  private val q31Sql =
    s"""SELECT doc_id,
       |  CAST($sqlWsCount AS INT) AS ws_tokens,
       |  CAST(LEN(regexp_extract_all(text, '${T.BpePattern}')) AS INT) AS bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Language ID (rows-only: testdata `lang` is a random tag, see
    * TextFunctions.langId doc; heuristic validated in TextSpec).
    */
  private def q32(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), T.langId(col("text")).as("pred_lang"),
        col("lang").as("tagged_lang"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q33
  /** Document fingerprinting: full-content hash + k-min-values sketch
    * of word 3-grams (winnowing-style) + token-sequence SimHash, all
    * in ONE map-side pass — a fingerprint stage at 100 TB is
    * scan-bound or it's wrong.
    *
    * Output is the q121-style CONTRACT view, so the driver's DuckDB
    * gate hash-checks it (the codes derive from xxhash64, which SQL
    * cannot reproduce — but their consistency invariants are exact):
    *  - `n_copies` / `sketch_len` are replicable values (group size by
    *    normalized text; min(8, distinct-3-gram count));
    *  - `hash_ok`: equal normalized text ⟺ equal content hash (both
    *    directions — a nondeterministic hash OR a cross-text collision
    *    flips it);
    *  - `kmin_ok`: equal gram SET ⇒ equal sketch (the reverse is not
    *    an invariant: bottom-8 legitimately collides for overlapping
    *    sets);
    *  - `simhash_ok`: equal token sequence ⇒ equal SimHash.
    * The group-size windows are per-key shuffles of (key, 1) rows —
    * at 100 TB you'd compute the same booleans with partial-agg
    * group-size joins; the semantics hash-checked here are identical.
    * The fingerprint VALUES themselves stay asserted by TextSpec
    * (determinism + known-answer rows).
    */
  private def q33(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(s, dir)
    // Bind `toks` as an attribute before the n-gram HOF (a lambda over
    // the raw tokenize expression re-runs the regex chain per n-gram).
    val grams = array_distinct(T.wordNGrams(col("toks"), 3))
    val simhash = GraftSqlBridge.column(
      SimHashSig(GraftSqlBridge.expression(col("toks"))))
    val fp = d
      .select(col("doc_id"), col("text"), T.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        T.normText(col("text")).as("nt"),
        to_json(array_sort(grams)).as("gs"),
        xxhash64(T.normText(col("text"))).as("content_hash"),
        to_json(Hashing.kMinSketch(
          Hashing.shingleHashes(grams), 8)).as("kmin_sketch"),
        size(Hashing.kMinSketch(
          Hashing.shingleHashes(grams), 8)).as("sketch_len"),
        coalesce(simhash, lit(0L)).as("simhash"))
    val nNt = count(lit(1)).over(Window.partitionBy("nt"))
    fp.select(
        col("doc_id"),
        nNt.as("n_copies"),
        col("sketch_len"),
        (count(lit(1)).over(Window.partitionBy("content_hash")) === nNt &&
          count(lit(1)).over(Window.partitionBy("nt", "content_hash")) === nNt)
          .as("hash_ok"),
        (count(lit(1)).over(Window.partitionBy("gs", "kmin_sketch")) ===
          count(lit(1)).over(Window.partitionBy("gs"))).as("kmin_ok"),
        (count(lit(1)).over(Window.partitionBy("nt", "simhash")) === nNt)
          .as("simhash_ok"))
      .orderBy("doc_id")
  }

  private val q33Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |         regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS nt,
      |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS tk
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, nt,
      |         CASE WHEN len(tk) >= 3
      |              THEN list_sort(list_distinct(list_transform(range(1, len(tk) - 1),
      |                     i -> array_to_string(tk[i:i+2], ' '))))
      |              ELSE [] END AS grams
      |  FROM t)
      |SELECT doc_id,
      |       COUNT(*) OVER (PARTITION BY nt) AS n_copies,
      |       CAST(LEAST(8, len(grams)) AS INT) AS sketch_len,
      |       TRUE AS hash_ok, TRUE AS kmin_ok, TRUE AS simhash_ok
      |FROM g ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_text_quality" -> (q30 _),
    "q31_tokens"       -> (q31 _),
    "q32_langid"       -> (q32 _),
    "q33_fingerprint"  -> (q33 _))

  /** q32's heuristic is deterministic and fully SQL-expressible, so it
    * gets a real oracle: the CASE order replicates langId's foldLeft
    * tie-break nesting (de, then en, then es, then fr) and `\x{...}`
    * is RE2's spelling of the CJK range.
    */
  private val q32Sql =
    """WITH toks AS (
      |  SELECT doc_id, lang AS tagged_lang, text,
      |         string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id, tagged_lang, text,
      |    len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it','that','for'))) AS en,
      |    len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','zu','auf'))) AS de,
      |    len(list_filter(toks, t -> t IN ('le','la','les','et','est','un','une','dans','que','pour'))) AS fr,
      |    len(list_filter(toks, t -> t IN ('el','la','los','las','es','un','una','que','de','por'))) AS es,
      |    length(text) - length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')) AS cjk
      |  FROM toks)
      |SELECT doc_id,
      |  CASE WHEN cjk * 5 > length(text) THEN 'zh'
      |       WHEN greatest(en,de,fr,es) = 0 THEN 'unknown'
      |       WHEN de = greatest(en,de,fr,es) THEN 'de'
      |       WHEN en = greatest(en,de,fr,es) THEN 'en'
      |       WHEN es = greatest(en,de,fr,es) THEN 'es'
      |       ELSE 'fr' END AS pred_lang,
      |  tagged_lang
      |FROM sc ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q30_text_quality" -> q30Sql,
    "q31_tokens"       -> q31Sql,
    "q32_langid"       -> q32Sql,
    "q33_fingerprint"  -> q33Sql)
}
