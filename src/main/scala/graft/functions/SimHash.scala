package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash over a token array, as a native Catalyst expression.
  *
  * SimHash (Charikar 2002; the near-dup detector popularized by
  * Manku/Jain/Sarma, WWW'07): hash every token; for each bit position
  * sum +1/-1 across tokens by whether that bit is set; the sign vector
  * is the fingerprint. Documents within small Hamming distance are
  * near-duplicates.
  *
  * Token hash: the top 60 bits (15 hex digits) of md5 — deterministic
  * across JVMs AND reproducible in any SQL engine with an md5
  * function, so the correctness oracle can recompute the fingerprint
  * value-exactly. 60 bits (not 64) keeps the fingerprint positive in a
  * signed 64-bit integer, avoiding sign-extension mismatches between
  * engines.
  *
  * A Catalyst `Expression` (vs a Scala UDF) keeps null semantics
  * declarative and avoids the UDF serialization boundary; eval-mode
  * only (CodegenFallback) — the surrounding plan still codegens.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  // analysis-time rejection (the BpeEncodeExpr pattern) instead of a
  // raw ClassCastException mid-job on e.g. graft_simhash64('abc')
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_simhash64 expects an array<string> argument, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = new Array[Int](SimHash64.Bits)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = SimHash64.hash60(arr.getUTF8String(i))
        var b = 0
        while (b < SimHash64.Bits) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < SimHash64.Bits) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Fingerprint width. 4 pieces of 15 bits (see Dedup.simhashPairs). */
  val Bits = 60

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(token) as a 60-bit long — equals SQL
    * `('0x' || substr(md5(t), 1, 15))::BIGINT`. */
  def hash60(s: UTF8String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xFL)
  }

  /** Column API: simhash of an array<string> token column (60-bit). */
  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(SimHash64(
      GraftSqlBridge.expression(org.apache.spark.sql.SparkSession.active, tokens)))
  }
}
