package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply a learned BPE merge table to a word-token array — the encode
  * half of [[graft.operators.Bpe]]. One tight loop per row; the merge
  * table rides along as plain strings in the expression instance
  * (plan literals), so the corpus scan is shuffle-free and
  * driver-independent — the [[CentroidDists]] pattern applied to
  * tokenizers.
  *
  * Per word: split into Unicode CODE POINTS (matching DuckDB
  * `substr(w, i, 1)` character semantics — not UTF-16 chars), then
  * apply each merge (a,b)→a+b in learned order as a left fold:
  * `if (out.last == a && next == b) replace-last-with-ab else append`.
  * The fold is value-equivalent to the classic leftmost-greedy
  * skip-scan because a merged token `a+b` can never equal `a` (b is
  * non-empty), and it is exactly replayable as a SQL `list_reduce`
  * (ExtQueries.bpeOracle). Output = the merged tokens of every word,
  * concatenated in word order.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"BpeEncode expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val out = new java.util.ArrayList[UTF8String]()
    var w = 0
    while (w < words.numElements()) {
      // null slots read as "" (SQL-exposed: must not NPE the task)
      val u = words.getUTF8String(w)
      val word = if (u == null) "" else u.toString
      var toks = Bpe.codePointSplit(word)
      var m = 0
      while (m < merges.length) {
        toks = Bpe.applyMerge(toks, merges(m)._1, merges(m)._2)
        m += 1
      }
      var t = 0
      while (t < toks.length) { out.add(UTF8String.fromString(toks(t))); t += 1 }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): BpeEncodeExpr = copy(child = c)
}

/** Shared pure kernels for BPE train (driver) and encode (expression) —
  * one implementation so the two sides cannot drift. */
object Bpe {
  /** Split into code points — DuckDB `substr(w,i,1)` character
    * semantics (a supplementary-plane char is ONE token, not a
    * surrogate pair). */
  def codePointSplit(word: String): Array[String] = {
    val n = word.codePointCount(0, word.length)
    val out = new Array[String](n)
    var i = 0; var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out(k) = new String(Character.toChars(cp))
      i += Character.charCount(cp)
      k += 1
    }
    out
  }

  /** One merge pass, left fold: replayable as a SQL list_reduce. */
  def applyMerge(toks: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (out.nonEmpty && out.last == a && t == b) out(out.length - 1) = a + b
      else out += t
      i += 1
    }
    out.toArray
  }

  import org.apache.spark.sql.GraftSqlBridge
  def encode(words: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeEncodeExpr(
      GraftSqlBridge.expression(org.apache.spark.sql.SparkSession.active, words), merges))
}
