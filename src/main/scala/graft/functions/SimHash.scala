package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array, as a native Catalyst expression.
  *
  * SimHash (Charikar 2002; the near-dup detector popularized by
  * Manku/Jain/Sarma, WWW'07): hash every token to 64 bits; for each bit
  * position sum +1/-1 across tokens by whether that bit is set; the
  * sign vector is the fingerprint. Documents within small Hamming
  * distance are near-duplicates.
  *
  * A Catalyst `Expression` (vs a Scala UDF) keeps null semantics
  * declarative and avoids the UDF serialization boundary; eval-mode
  * only (CodegenFallback) — the surrounding plan still codegens.
  *
  * Token hash: two Murmur3-32 passes (seeds 0x9747b28c / 0x85ebca6b)
  * combined into 64 bits — deterministic across JVMs, no dependency on
  * java hashCode.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = SimHash64.hash64(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def hash64(s: UTF8String): Long = {
    val lo = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x9747b28c)
    val hi = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x85ebca6b)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  /** Column API: simhash64 of an array<string> token column. */
  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(SimHash64(
      GraftSqlBridge.expression(org.apache.spark.sql.SparkSession.active, tokens)))
  }
}
