package graft

import org.apache.spark.sql.functions._
import graft.functions.TextNormalize
import graft.operators.PipelineOps

class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(text: String): String =
    Seq(Tuple1(text)).toDF("t")
      .select(TextNormalize.normalizeText($"t")).as[String].head()

  test("mojibake repair: every pinned entry maps to its intended character") {
    // after repair the curly/dash/ellipsis targets fold to ASCII, the
    // accented letters survive as themselves
    assert(norm("CafÃ©") == "Café")
    assert(norm("naÃ¯ve".replace("Ã¯", "Ã±")) == "nañve")
    assert(norm("\u00E2\u20AC\u0153quoted and \u00E2\u20AC\u02DCone\u00E2\u20AC\u2122") == "\"quoted and 'one'")
    assert(norm("aâ€”b â€“ c â€¦") == "a-b - c ...")
    // the full pinned table, round-tripped in one string
    val dirty = TextNormalize.mojibake.map(_._1).mkString(" ")
    val out = norm(dirty)
    assert(!out.contains("Ã") && !out.contains("â"),
      s"unrepaired mojibake survived: '$out'")
  }

  test("NFC composes combining sequences; ASCII takes the no-copy fast path") {
    assert(norm("Café") == "Café")
    assert(norm("plain ascii") == "plain ascii")
    // the scalar alone (not the full chain) composes too
    val r = Seq(Tuple1("é")).toDF("t")
      .select(TextNormalize.nfc($"t")).as[String].head()
    assert(r == "é")
  }

  test("punctuation folds, zero-width deletion, control strip, whitespace collapse, trim") {
    assert(norm("‘a’ “b” c–d e—f") == "'a' \"b\" c-d e-f")
    assert(norm("x\u00A0y") == "x y") // NBSP -> space
    assert(norm("a\u200Bb\u200C\u200Dc\uFEFF") == "abc") // zero-widths deleted
    assert(norm("a\u0001b\u007Fc") == "abc") // C0/DEL stripped
    assert(norm("  a \t\t b  ") == "a b")          // collapse + trim
    assert(norm("line1\nline2") == "line1\nline2") // newlines PRESERVED
    val nullOut = Seq(Tuple1(null: String)).toDF("t")
      .select(TextNormalize.normalizeText($"t")).as[String].head()
    assert(nullOut == "")
  }

  test("NfcNormalize rides whole-stage codegen (static call, no fallback)") {
    // spark.range defeats ConvertToLocalRelation, so the projection
    // really compiles; the generated code must contain the emitted
    // static call (a CodegenFallback would instead eval() a captured
    // expression reference)
    val df = spark.range(1).select(TextNormalize.normalizeText(
      concat(lit("e\u0301x"), $"id".cast("string"))).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // the simple-string form marks whole-stage-codegen spans with "*(n)"
    assert(plan.contains("*(1) Project"), s"expected codegen span:\n$plan")
    val code = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(code.contains("graft.functions.TextNormalize.nfcImpl"),
      s"NFC must codegen a static call:\n${code.take(2000)}")
    assert(df.as[String].head() == "\u00E9x0")
  }

  test("sqlLit: printable runs quoted, invisibles as chr(), quotes escaped") {
    assert(TextNormalize.sqlLit("abc") == "'abc'")
    assert(TextNormalize.sqlLit("a'b") == "'a''b'")
    assert(TextNormalize.sqlLit("a\u0001b") == "'a' || chr(1) || 'b'")
    assert(TextNormalize.sqlLit("\u00A0") == "chr(160)")
    assert(TextNormalize.sqlLit("") == "''")
    // no raw control/invisible code point ever reaches the SQL text
    val all = TextNormalize.sqlLit("x\u0001\u200B\uFEFF\u0301y")
    assert(!all.exists(c => c < ' ' || c == '\u200B' || c == '\uFEFF' || c == '\u0301'))
  }

  test("oracleExpr embeds every pinned mojibake entry (no drift possible)") {
    val sql = TextNormalize.oracleExpr("text")
    TextNormalize.mojibake.foreach { case (bad, _) =>
      assert(sql.contains(TextNormalize.sqlLit(bad)), s"oracle misses '$bad'")
    }
    assert(sql.contains("nfc_normalize") && sql.contains("translate")
      && sql.contains("'g'"))
  }

  test("dedupLinesInDoc: doc-local first occurrence, cross-doc repeats kept") {
    val df = Seq(
      (1L, "a b a c b"),   // intra-doc repeats removed
      (2L, "a b"),         // doc 2 keeps its own 'a b' (global dedup wouldn't)
      (3L, ""),            // empty text: one empty segment, kept
      (4L, null: String)   // null ≡ empty
    ).toDF("doc_id", "text")
    val r = PipelineOps.dedupLinesInDoc(df, "doc_id", "text", delim = " ")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(r(0) == ((1L, "a b c", 5L, 3L)))
    assert(r(1) == ((2L, "a b", 2L, 2L)))
    assert(r(2) == ((3L, "", 1L, 1L)))
    assert(r(3) == ((4L, "", 1L, 1L)))
  }

  test("dedupLinesInDoc shuffles nothing (single stage, no exchange)") {
    val df = Seq((1L, "x y x")).toDF("doc_id", "text")
    val plan = PipelineOps.dedupLinesInDoc(df, "doc_id", "text", " ")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"row-local op must not shuffle:\n$plan")
  }
}
