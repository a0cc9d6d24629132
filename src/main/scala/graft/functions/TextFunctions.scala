package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus pipelines: token
  * counting, quality scoring, language ID, document fingerprinting.
  * All built from codegen'd `org.apache.spark.sql.functions` — no UDFs
  * in the hot path (the one custom piece, SimHash, is a native Catalyst
  * expression in [[SimHash64]]).
  */
object TextFunctions {

  /** Whitespace tokens (non-space runs). Empty/blank text → empty
    * array. Single-pass native expression (≡ regexp_extract_all(text,
    * "\\S+") — see [[Tokenize]]). */
  def tokens(text: Column): Column = Tokenize.whitespaceTokens(text)

  /** BPE-ish subword-friendly tokens: letter runs, digit runs, or single
    * punctuation — the usual pre-tokenizer family; single-pass native
    * expression. */
  def bpeishTokens(text: Column): Column = Tokenize.bpeishTokens(text)

  /** Token count with the document-signal null convention: NULL text
    * counts as an absent document — 0 tokens, not NULL (`size(NULL)`
    * would be NULL and poison downstream LONG arithmetic like shard
    * packing; the DuckDB oracles spell this `len(regexp_extract_all(
    * COALESCE(text,''), …))`). The raw [[tokens]] stays
    * null-propagating, mirroring `regexp_extract_all` exactly. */
  def tokenCount(text: Column): Column = size(tokens(coalesce(text, lit(""))))

  /** Character n-gram shingles via a transform over positions — stays
    * inside Catalyst (no UDF), scales linearly with text length.
    * Text shorter than `n` (and null text) yields an EMPTY array: the
    * natural `sequence(1, length - n + 1)` spelling alone would emit
    * `[1, 0]` for short text (Spark's sequence defaults to step -1
    * when start > stop) and hand back a phantom whole-text shingle. */
  def charShingles(text: Column, n: Int): Column = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    array_distinct(expr(
      (s"CASE WHEN length(__t) >= $n THEN " +
        s"transform(sequence(1, length(__t) - ${n - 1}), i -> substring(__t, i, $n)) " +
        "ELSE CAST(array() AS ARRAY<STRING>) END")
        .replace("__t", sqlRef(text))))
  }

  /** Word n-gram shingles from the whitespace tokens (distinct, in
    * first-occurrence order). Single-pass native expressions — the
    * token array is built once per row, not once per shingle. */
  def wordShingles(text: Column, n: Int): Column =
    array_distinct(Tokenize.wordShingles(tokens(text), n))

  // only plain column references are spliced into expr() strings
  private def sqlRef(c: Column): String = {
    val s = c.toString
    require(s.matches("[A-Za-z_][A-Za-z0-9_]*"), s"need a plain column ref, got $s")
    s
  }

  // ── quality scoring (length / punctuation / stopword ratios) ───────
  private val enStopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "that", "this", "be")

  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
      nullif_zero(length(text))
  def digitRatio(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", "")).cast("double") /
      nullif_zero(length(text))
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", "")).cast("double") /
      nullif_zero(length(text))
  def upperRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Z]", "")).cast("double") /
      nullif_zero(length(text))
  def stopwordRatio(text: Column): Column = stopwordRatioOf(tokens(lower(text)))
  def meanTokenLen(text: Column): Column = meanTokenLenOf(tokens(text))

  /** Token-array variants: project the token arrays ONCE
    * (`withColumn("toks", tokens(...))`) and feed them here — Catalyst
    * keeps the producing Project separate when a non-cheap alias is
    * reused, so the tokenizer regex runs once per row instead of once
    * per derived metric. */
  def stopwordRatioOf(lowerToks: Column): Column =
    size(filter(lowerToks, t => t.isin(enStopwords: _*))).cast("double") /
      nullif_zero(size(lowerToks))
  def meanTokenLenOf(toks: Column): Column =
    aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") /
      nullif_zero(size(toks))

  private def nullif_zero(c: Column): Column =
    when(c === 0, lit(null)).otherwise(c.cast("double"))

  /** Composite quality score in [0,1]: rewards stopword presence and
    * alphabetic content, penalizes digit/punct walls and extreme token
    * lengths — the standard web-corpus heuristic family (Gopher-style
    * rules), deterministic and SQL-mirrorable. */
  def qualityScore(text: Column): Column =
    qualityScoreOf(text, tokens(text), tokens(lower(text)))

  def qualityScoreOf(text: Column, toks: Column, lowerToks: Column): Column = {
    val lenOk = when(length(text).between(50, 10000), 1.0).otherwise(0.0)
    val meanOk = when(coalesce(meanTokenLenOf(toks), lit(0.0)).between(3.0, 12.0), 1.0).otherwise(0.0)
    val alpha = coalesce(alphaRatio(text), lit(0.0))
    val stop = least(coalesce(stopwordRatioOf(lowerToks), lit(0.0)) * 5.0, lit(1.0))
    val digitPenalty = coalesce(digitRatio(text), lit(0.0))
    (lenOk * 0.2) + (meanOk * 0.2) + (alpha * 0.3) + (stop * 0.2) +
      ((lit(1.0) - digitPenalty) * 0.1)
  }

  // ── language identification (stopword + script heuristic) ──────────
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "are", "this", "have", "not"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "auf", "für", "sich", "dass", "werden"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "une", "dans", "que", "pour", "qui", "pas", "sur", "avec"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es", "por", "con", "para", "su"))

  /** n-gram/stopword language ID: CJK script share → zh; otherwise the
    * stopword profile with the highest token hit-rate, requiring a
    * minimal signal, else "und". Pure Column expression — runs at scan
    * speed over a 100 TB corpus. */
  def langId(text: Column, minScore: Double = 0.05): Column =
    langIdOf(text, tokens(lower(text)), minScore)

  def langIdOf(text: Column, lowerToks: Column, minScore: Double = 0.05): Column = {
    val total = nullif_zero(size(lowerToks))
    val scores = langProfiles.map { case (lang, words) =>
      lang -> (size(filter(lowerToks, t => t.isin(words: _*))).cast("double") / total)
    }
    val cjkShare = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")).cast("double") /
      nullif_zero(length(text))
    // argmax via array<struct>: each score is computed exactly once
    val packed = array_max(array(scores.map { case (lang, s) =>
      struct(coalesce(s, lit(0.0)).as("score"), lit(lang).as("lang"))
    }: _*))
    val pick = when(packed.getField("score") >= minScore, packed.getField("lang"))
      .otherwise("und")
    when(coalesce(cjkShare, lit(0.0)) > 0.3, "zh").otherwise(pick)
  }

  /** Document fingerprint: md5 of case/whitespace-normalized text —
    * the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** 60-bit SimHash fingerprint over whitespace tokens (md5-derived
    * per-token hashes — SQL-mirrorable for the oracle gate). NULL text
    * hashes like the empty document (0) rather than propagating NULL:
    * a NULL simhash never equi-joins, so null-text duplicates would
    * silently escape the [[graft.operators.Dedup.dedupSimhash]] piece
    * join while the oracle's COALESCE(...,0) pairs them — token-less
    * docs all collide at 0 by design (they ARE mutual duplicates). */
  def simhash(text: Column): Column =
    SimHash64.simhash64(tokens(coalesce(text, lit(""))))

  // ── PII redaction ──────────────────────────────────────────────────
  // Patterns restricted to the syntax Java regex and RE2 share
  // (character classes, bounded intervals, \b word boundaries — no
  // backreferences or lookaround), so a SQL engine replays the exact
  // match set. ASCII \d ≡ [0-9] in both (Java only widens it under
  // UNICODE_CHARACTER_CLASS, which Spark does not set).

  /** RFC-ish email address (the pragmatic pattern, not full RFC 5322). */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded (does not range-check octets). */
  val ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Number of non-overlapping matches of `pattern` in `text`. */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Redact emails then IPv4 addresses (in that order — the emitted
    * `<EMAIL>` token contains no digits, so it can never create a new
    * IPv4 match). Replacement is global on both engines: Spark's
    * `regexp_replace` always replaces all; SQL mirrors need the 'g'
    * flag. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"),
      ipv4Pattern, "<IP>")
}
