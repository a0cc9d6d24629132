package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ftfy-style text normalization for crawl-scale corpora: mojibake
  * repair, Unicode NFC composition, punctuation folding, control-byte
  * stripping, and horizontal-whitespace collapse — the cleanup pass a
  * training-data pipeline runs before any tokenization or dedup, since
  * "CafÃ©" and "Café" must fingerprint identically.
  * (Extension family — the reference has no text-encoding repair; this
  * mirrors the public ftfy / CCNet preprocessing conventions.)
  *
  * Scale shape: the whole pass is ONE row-local expression tree — a
  * pinned `replace` chain, one custom scalar, one `translate`, two
  * `regexp_replace`es, a `trim` — so it rides whole-stage codegen
  * end-to-end (the NFC kernel emits a static call via `doGenCode`,
  * not a CodegenFallback), shuffles nothing, and pushes through any
  * downstream filter unchanged. At 100 TB it is scan-bound by
  * construction.
  *
  * Oracle parity: every step has an exact DuckDB spelling
  * ([[TextNormalize.oracleExpr]] generates it from the SAME pinned
  * tables, so Spark and oracle can never drift): `replace` chains,
  * `nfc_normalize` (both sides implement Unicode canonical
  * composition), `translate` (both engines delete `from`-chars beyond
  * `to`'s length), `regexp_replace(..., 'g')`, space-only `trim`.
  *
  * All non-ASCII characters below are spelled as \u escapes — the
  * pinned tables ARE the contract, so they must be visible in source.
  */
object TextNormalize {

  /** Pinned mojibake repairs: UTF-8 byte sequences that were decoded
    * as cp1252/latin-1 once, mapped back to the intended character.
    * Only unambiguous pairs are pinned (e.g. NOT "Ã­" for
    * 'í' — U+00AD is an invisible soft hyphen). Applied in order as
    * plain (non-regex) replaces; no entry is a prefix of a later
    * entry's match.
    */
  val mojibake: Seq[(String, String)] = Seq(
    "â€™" -> "’", // â€™ (E2 80 99 via cp1252) → ’
    "â€˜" -> "‘", // â€˜ → ‘
    "â€œ" -> "“", // â€œ → “
    "â€¦" -> "…", // â€¦ → …
    "â€“" -> "–", // â€“ → –
    "â€”" -> "—", // â€” → —
    "Ã©" -> "é",       // Ã© (C3 A9) → é
    "Ã¨" -> "è",       // Ã¨ → è
    "Ã¡" -> "á",       // Ã¡ → á
    "Ã³" -> "ó",       // Ã³ → ó
    "Ã¤" -> "ä",       // Ã¤ → ä
    "Ã¶" -> "ö",       // Ã¶ → ö
    "Ã¼" -> "ü",       // Ã¼ → ü
    "Ã±" -> "ñ",       // Ã± → ñ
    "Ã§" -> "ç",       // Ã§ → ç
    "\u00C2\u00A0" -> "\u00A0" // C2 A0 re-decoded: mojibake NBSP (-> ' ' below)
  )

  /** 1:1 punctuation folds (and deletions) applied via `translate`:
    * curly quotes → straight, en/em dash → '-', NBSP → space;
    * zero-width space/joiners and the BOM are DELETED (`from` chars
    * with no `to` counterpart). */
  val foldFrom = "\u2018\u2019\u201C\u201D\u2013\u2014\u00A0" +
    "\u200B\u200C\u200D\uFEFF"
  val foldTo = "''\"\"-- "

  /** '…' → "..." is the one 1:many fold (translate is 1:1 only). */
  val ellipsis: (String, String) = "\u2026" -> "..."

  /** C0 controls except \t \n \r, plus DEL. Identical class semantics
    * in Java regex (Spark) and RE2 (DuckDB). */
  val controlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Horizontal whitespace runs → one space (newlines preserved —
    * paragraph structure is load-bearing for line-level ops). */
  val hspaceClass = "[ \\t]+"

  private def toExpr(c: Column): Expression =
    GraftSqlBridge.expression(SparkSession.active, c)

  /** Unicode NFC composition as a codegen'd scalar. */
  def nfc(c: Column): Column = GraftSqlBridge.column(NfcNormalize(toExpr(c)))

  /** The full normalization chain. Null text ≡ empty. */
  def normalizeText(c: Column): Column = {
    val repaired = mojibake.foldLeft(coalesce(c, lit(""))) {
      case (acc, (bad, good)) => replace(acc, lit(bad), lit(good))
    }
    val folded = replace(translate(nfc(repaired), foldFrom, foldTo),
      lit(ellipsis._1), lit(ellipsis._2))
    val stripped = regexp_replace(folded, controlClass, "")
    trim(regexp_replace(stripped, hspaceClass, " "))
  }

  /** DuckDB spelling of [[normalizeText]] over the SQL expression
    * `inner`, generated from the same pinned tables (single source of
    * truth — the gate oracle calls this). */
  def oracleExpr(inner: String): String = {
    val repaired = mojibake.foldLeft(s"COALESCE($inner,'')") {
      case (acc, (bad, good)) => s"replace($acc, ${sqlLit(bad)}, ${sqlLit(good)})"
    }
    val folded = s"replace(translate(nfc_normalize($repaired), " +
      s"${sqlLit(foldFrom)}, ${sqlLit(foldTo)}), " +
      s"${sqlLit(ellipsis._1)}, ${sqlLit(ellipsis._2)})"
    s"trim(regexp_replace(regexp_replace($folded, '$controlClass', '', 'g'), " +
      s"'$hspaceClass', ' ', 'g'))"
  }

  /** Code points spelled as `chr(n)` in generated SQL (invisible or
    * whitespace-ambiguous): C0 controls, DEL, NBSP, zero-widths, BOM,
    * combining acute. Everything else rides inside quoted literals. */
  private def needsChr(ch: Char): Boolean =
    ch < 0x20 || ch == 0x7F || ch == 0xA0 ||
      ch == 0x200B || ch == 0x200C || ch == 0x200D || ch == 0xFEFF ||
      ch == 0x0301

  /** A DuckDB string expression for `s`: printable runs as quoted
    * literals ('' -escaped), invisible code points as `chr(n)` — keeps
    * the generated SQL readable and safe through the JSON envelope. */
  def sqlLit(s: String): String = {
    if (s.isEmpty) return "''"
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = new StringBuilder
    def flushRun(): Unit = if (run.nonEmpty) {
      parts += "'" + run.toString.replace("'", "''") + "'"
      run.clear()
    }
    s.foreach { ch =>
      if (needsChr(ch)) { flushRun(); parts += s"chr(${ch.toInt})" }
      else run += ch
    }
    flushRun()
    parts.mkString(" || ")
  }

  /** NFC kernel body (public: the generated code calls the static
    * forwarder `graft.functions.TextNormalize.nfcImpl`). ASCII and
    * already-composed text take the `isNormalized` fast path and
    * return the input UTF8String unchanged (no copy). */
  def nfcImpl(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC composition (canonical decomposition + composition),
  * e.g. "e" + U+0301 → "é". Unlike the array-returning kernels this is
  * a scalar with real `doGenCode` — the emitted code is one static
  * call, so the surrounding normalization chain stays inside
  * whole-stage codegen. Matches DuckDB's `nfc_normalize` (both
  * implement Unicode canonical composition).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TextNormalize.nfcImpl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormalize.nfcImpl($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}
