package graft.score

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable.ArrayBuffer

/** Batched per-group chart scoring in ONE shuffle — the optimization
  * SURVEY §2.10 sketches: instead of collecting each chart's series to
  * the driver and scoring there (one job per chart), an `Aggregator`
  * computes the score inside the aggregation, so scoring N charts =
  * one `groupBy(chartId).agg(...)`.
  *
  * The buffer is bounded by `cap`, and the truncation is DETERMINISTIC:
  * a group larger than `cap` keeps exactly the multiset of its `cap`
  * LARGEST values (amortized via sort-and-halve compaction), which is
  * independent of row order, partitioning, and merge order — so the
  * score is reproducible on any cluster and by the DuckDB oracle
  * (which mirrors the same sort-and-slice). Keeping the largest tail
  * is the right truncation for these metrics: both scorers regress the
  * ASCENDING-sorted series, and outstanding1 specifically measures how
  * much the top values stand out. The finish step runs the exact
  * driver-side formula ([[Significance.outstanding1]] /
  * [[Significance.linearness]]), so both paths agree bit-for-bit
  * (spec-pinned).
  */
object GroupScore {

  val MaxValues = 100000

  /** Aggregation buffer (public: the encoder requires a public class). */
  final case class Buf(values: ArrayBuffer[Double])

  private def addCapped(b: Buf, a: Double, cap: Int): Buf = {
    b.values += a
    if (b.values.length >= 2 * cap) compact(b, cap)
    b
  }

  private def mergeCapped(a: Buf, b: Buf, cap: Int): Buf = {
    a.values ++= b.values
    if (a.values.length >= 2 * cap) compact(a, cap)
    a
  }

  /** Keep the `cap` largest values (deterministic multiset). */
  private def compact(b: Buf, cap: Int): Unit = {
    val sorted = b.values.toArray
    java.util.Arrays.sort(sorted)
    b.values.clear()
    b.values ++= sorted.takeRight(cap)
  }

  private def kept(b: Buf, cap: Int): Array[Double] = {
    if (b.values.length <= cap) b.values.toArray
    else {
      val sorted = b.values.toArray
      java.util.Arrays.sort(sorted)
      sorted.takeRight(cap)
    }
  }

  private class Outstanding1Agg(cap: Int) extends Aggregator[Double, Buf, Double] {
    def zero: Buf = Buf(ArrayBuffer.empty)
    def reduce(b: Buf, a: Double): Buf = addCapped(b, a, cap)
    def merge(a: Buf, b: Buf): Buf = mergeCapped(a, b, cap)
    def finish(b: Buf): Double = Significance.outstanding1(kept(b, cap))
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private class LinearnessAgg(cap: Int) extends Aggregator[Double, Buf, Double] {
    def zero: Buf = Buf(ArrayBuffer.empty)
    def reduce(b: Buf, a: Double): Buf = addCapped(b, a, cap)
    def merge(a: Buf, b: Buf): Buf = mergeCapped(a, b, cap)
    // linearness depends on input order — score the sorted series
    def finish(b: Buf): Double = Significance.linearness(kept(b, cap).sorted)
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** outstanding1 as an aggregate Column:
    * `df.groupBy(chart).agg(outstanding1(col))`. Order-insensitive
    * (the metric sorts internally; the cap keeps the largest values). */
  def outstanding1(values: Column, cap: Int = MaxValues): Column =
    udaf(new Outstanding1Agg(cap), Encoders.scalaDouble).apply(values)

  /** linearness as an aggregate Column (values sorted for partition-
    * order independence; the cap keeps the largest values). */
  def linearness(values: Column, cap: Int = MaxValues): Column =
    udaf(new LinearnessAgg(cap), Encoders.scalaDouble).apply(values)
}
