package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis building blocks for training-data pipelines (SURVEY.md
 * §2.3), all composed from codegen'd built-ins so they run inside
 * whole-stage codegen. Every function has an exact DuckDB-SQL twin
 * (regex semantics shared between Java regex and RE2 for the patterns
 * used here), which is what makes the oracle checks possible.
 */
object TextFunctions {

  /** Whitespace-separated token count (0 for empty/whitespace-only text —
    * split of an empty string yields one empty token otherwise). */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish pre-tokenization count: words / numbers / single punctuation,
    * the usual first split before byte-pair merging. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  private val stopwords = Seq("the", "a", "of", "and", "in", "to")

  def stopwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("\\b(" + stopwords.mkString("|") + ")\\b"), lit(0))).cast("long")

  /** Quality signals: doc length, word stats, punctuation + stopword
    * ratios, and a coarse keep/drop flag — the Gopher-rules shape of
    * corpus filtering. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val nChars = length(text).cast("long")
    val nWords = wsTokenCount(text)
    val nPunct = punctCount(text)
    val nStop = stopwordCount(text)
    // greatest(_, 1) denominators: Spark null vs DuckDB inf on x/0 would
    // diverge for empty docs; both engines agree on x/1
    val meanWordLen = length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(nWords, lit(1L)).cast("double")
    val stopRatio = nStop.cast("double") / greatest(nWords, lit(1L)).cast("double")
    val punctRatio = nPunct.cast("double") / greatest(nChars, lit(1L)).cast("double")
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "mean_word_len" -> meanWordLen,
      "stop_ratio" -> stopRatio,
      "punct_ratio" -> punctRatio,
      "keep" -> (nWords >= 10 && nWords <= 100000 &&
        meanWordLen >= 2.0 && meanWordLen <= 12.0 && punctRatio <= 0.2).cast("int"))
  }

  /** Gopher-rules document filter (Rae et al. 2021 "Scaling Language
    * Models", Appendix A — the standard heuristic-filter bundle for web
    * corpora) in EXACT integer arithmetic: every ratio rule is
    * cross-multiplied, so the keep flag never touches a float and an
    * external oracle states identical integers at any parallelism.
    * Rules: 50 ≤ words ≤ 100k; mean word length in [3,10]
    * (non_ws ∈ [3·words, 10·words]); symbol(`#`/`...`)-to-word ratio
    * ≤ 0.1; ≤90% bullet-started lines; ≤30% ellipsis-ended lines;
    * ≥80% of words contain a letter; ≥2 stopword hits (total
    * occurrences — a deliberate simplification of the paper's
    * "2 distinct stopwords"). */
  def gopherColumns(text: Column): Seq[(String, Column)] = {
    def cnt(expr: Column, pat: String): Column =
      size(regexp_extract_all(expr, lit(pat), lit(0))).cast("long")
    val nWords = wsTokenCount(text)
    val nonWs = length(regexp_replace(text, "\\s+", "")).cast("long")
    val symbols = cnt(text, "#|\\.\\.\\.")
    val nLines = size(split(text, "\n")).cast("long")
    val bullets = cnt(text, "(?m)^\\s*[-*•]")
    val ellipses = cnt(text, "(?m)\\.\\.\\.$")
    val alphaWords = cnt(text, "\\S*[A-Za-z]\\S*")
    val stopHits = cnt(lower(text), "\\b(the|be|to|of|and|that|have|with)\\b")
    Seq(
      "n_words" -> nWords,
      "non_ws" -> nonWs,
      "n_symbols" -> symbols,
      "n_lines" -> nLines,
      "bullet_lines" -> bullets,
      "ellipsis_lines" -> ellipses,
      "alpha_words" -> alphaWords,
      "stop_hits" -> stopHits,
      "keep" -> (nWords >= 50L && nWords <= 100000L &&
        nonWs >= nWords * 3L && nonWs <= nWords * 10L &&
        symbols * 10L <= nWords &&
        bullets * 10L <= nLines * 9L &&
        ellipses * 10L <= nLines * 3L &&
        alphaWords * 10L >= nWords * 8L &&
        stopHits >= 2L).cast("int"))
  }

  /** Language-ID heuristic: stopword-marker counts per language, CJK by
    * codepoint class; highest score wins (en on ties). */
  def langIdColumns(text: Column): (Seq[(String, Column)], Column) = {
    def cnt(pat: String): Column =
      size(regexp_extract_all(lower(text), lit(pat), lit(0))).cast("long")
    val sEn = cnt("\\b(the|and|of|is|was)\\b")
    val sDe = cnt("\\b(der|die|das|und|ist)\\b")
    val sFr = cnt("\\b(le|la|les|et|est)\\b")
    val sEs = cnt("\\b(el|los|las|es|y)\\b")
    // \x{...} form: valid in both Java regex (Spark) and RE2 (DuckDB)
    val sZh = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0))).cast("long")
    val pred = when(sZh > 0, "zh")
      .when(sDe > sEn && sDe >= sFr && sDe >= sEs, "de")
      .when(sFr > sEn && sFr >= sEs, "fr")
      .when(sEs > sEn, "es")
      .when(sEn > 0, "en")
      .otherwise("unknown")
    (Seq("s_en" -> sEn, "s_de" -> sDe, "s_fr" -> sFr, "s_es" -> sEs, "s_zh" -> sZh), pred)
  }

  /** DuckDB twins of the above, shared by the oracle SQL strings. */
  /** PII redaction patterns (training-data scrubbing stage). Deliberately
    * inside the COMMON subset of Java regex and RE2 — char classes,
    * bounded repeats, \b — no lookaround/backrefs, so the DuckDB oracle
    * states the same automaton. Application order matters: emails first
    * (their digits would otherwise feed the phone run), then dotted IPv4,
    * then phone-like digit runs (aggressive by design: any 8+ digit run
    * with separators is treated as a dialable number). */
  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePat = "\\+?\\d[\\d .-]{6,}\\d"

  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPat, "<EMAIL>"),
        ipv4Pat, "<IP>"),
      phonePat, "<PHONE>")

  object sql {
    def cnt(expr: String, pat: String) = s"len(regexp_extract_all($expr, '$pat'))"
    val wsTokens =
      "CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
    val bpeTokens = cnt("text", "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
    val punct = cnt("text", "[^A-Za-z0-9\\s]")
    val stop = cnt("lower(text)", "\\b(" + stopwords.mkString("|") + ")\\b")
    /** [[gopherColumns]] twin over a column named `gtext`: the same counts
      * (RE2 states (?m)/\S/\b identically to Java regex) and the same
      * cross-multiplied integer keep rule. */
    val gopher: String = {
      def c(expr: String, pat: String) = s"len(regexp_extract_all($expr, '$pat'))"
      val words = wsTokens.replace("text", "gtext")
      s"""$words AS n_words,
         |    length(regexp_replace(gtext, '\\s+', '', 'g')) AS non_ws,
         |    ${c("gtext", "#|\\.\\.\\.")} AS n_symbols,
         |    len(regexp_split_to_array(gtext, '\\n')) AS n_lines,
         |    ${c("gtext", "(?m)^\\s*[-*•]")} AS bullet_lines,
         |    ${c("gtext", "(?m)\\.\\.\\.$")} AS ellipsis_lines,
         |    ${c("gtext", "\\S*[A-Za-z]\\S*")} AS alpha_words,
         |    ${c("lower(gtext)", "\\b(the|be|to|of|and|that|have|with)\\b")} AS stop_hits""".stripMargin
    }
    val gopherKeep: String =
      """CASE WHEN n_words >= 50 AND n_words <= 100000
        |        AND non_ws >= n_words * 3 AND non_ws <= n_words * 10
        |        AND n_symbols * 10 <= n_words
        |        AND bullet_lines * 10 <= n_lines * 9
        |        AND ellipsis_lines * 10 <= n_lines * 3
        |        AND alpha_words * 10 >= n_words * 8
        |        AND stop_hits >= 2 THEN 1 ELSE 0 END""".stripMargin
    /** DuckDB needs the explicit 'g' flag (Spark replaces all by default). */
    def redacted(expr: String): String =
      s"regexp_replace(regexp_replace(regexp_replace($expr, " +
        s"'$emailPat', '<EMAIL>', 'g'), " +
        s"'$ipv4Pat', '<IP>', 'g'), " +
        s"'$phonePat', '<PHONE>', 'g')"
  }
}
