package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter sketch as a Catalyst
  * `TypedImperativeAggregate` — the repo's first imperative aggregate:
  * each partition keeps at most `k` (item, counter) pairs, partials
  * merge by counter sum + subtract-the-(k+1)-th-largest (the mergeable
  * summaries result, Agarwal et al. PODS 2012), so the final state is
  * ≤ k entries regardless of input size or partitioning.
  *
  * Guarantee (what [[graft.operators.HeavyHitters]] builds on): the
  * sketch undercounts by at most n/(k+1), so EVERY item with true
  * frequency > n/k is still present in the merged sketch — the
  * candidate set is provably complete above that threshold. Items'
  * counter VALUES are order-dependent (as in any MG sketch), which is
  * why the operator never exposes them: it emits candidate items only
  * and re-counts exactly.
  *
  * Scale shape: fixed k·(item+8B) state per partition, map-side
  * combinable like any aggregate; the one reducer holds ≤ k entries.
  * Update is O(1) amortized (the decrement-all overflow path is O(k)
  * but each decrement pays for a prior increment).
  */
case class MisraGriesSketch(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v != null) {
      b.get(v) match {
        case Some(c) => b.update(v, c + 1) // key already owned by the map
        case None =>
          if (b.size < k) {
            // eval may hand back a pointer into a reused row buffer —
            // stored keys must own their bytes
            b.put(v.clone(), 1L)
          } else {
            // classic MG: the overflowing item and every counter give
            // up one occurrence
            val dead = mutable.ArrayBuffer.empty[UTF8String]
            b.keysIterator.foreach { key =>
              val c = b(key) - 1
              if (c == 0L) dead += key else b.update(key, c)
            }
            dead.foreach(b.remove)
          }
      }
    }
    b
  }

  override def merge(b: mutable.HashMap[UTF8String, Long],
                     o: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    o.foreach { case (key, c) =>
      // keys from a deserialized partial own their bytes already
      b.update(key, b.getOrElse(key, 0L) + c)
    }
    if (b.size > k) {
      val t = b.values.toArray.sorted(Ordering[Long].reverse).apply(k) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      b.keysIterator.foreach { key =>
        val c = b(key) - t
        if (c <= 0L) dead += key else b.update(key, c)
      }
      dead.foreach(b.remove)
    }
    b
  }

  /** Candidate items, binary-sorted for a deterministic array. */
  override def eval(b: mutable.HashMap[UTF8String, Long]): Any =
    new GenericArrayData(b.keys.toArray.sorted.toSeq)

  override def serialize(b: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (key, c) =>
      val bytes = key.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len); in.readFully(buf)
      b.put(UTF8String.fromBytes(buf), in.readLong())
      i += 1
    }
    b
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesSketch =
    copy(child = c)
}

object MisraGriesSketch {
  def candidates(c: Column, k: Int): Column = {
    val e = GraftSqlBridge.expression(SparkSession.active, c)
    GraftSqlBridge.column(MisraGriesSketch(e, k).toAggregateExpression())
  }
}
