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
  * The buffer holds the group's values (bounded by `maxValues` — chart
  * series are bounded by construction); the finish step runs the exact
  * driver-side formula ([[Significance.outstanding1]]), so both paths
  * agree bit-for-bit (spec-pinned).
  */
object GroupScore {

  private val MaxValues = 100000

  /** Aggregation buffer (public: the encoder requires a public class). */
  final case class Buf(values: ArrayBuffer[Double])

  private class Outstanding1Agg extends Aggregator[Double, Buf, Double] {
    def zero: Buf = Buf(ArrayBuffer.empty)
    def reduce(b: Buf, a: Double): Buf = {
      if (b.values.length < MaxValues) b.values += a
      b
    }
    def merge(a: Buf, b: Buf): Buf = {
      val room = MaxValues - a.values.length
      if (room > 0) a.values ++= b.values.take(room)
      a
    }
    def finish(b: Buf): Double = Significance.outstanding1(b.values.toArray)
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private class LinearnessAgg extends Aggregator[Double, Buf, Double] {
    def zero: Buf = Buf(ArrayBuffer.empty)
    def reduce(b: Buf, a: Double): Buf = {
      if (b.values.length < MaxValues) b.values += a
      b
    }
    def merge(a: Buf, b: Buf): Buf = {
      val room = MaxValues - a.values.length
      if (room > 0) a.values ++= b.values.take(room)
      a
    }
    // linearness sorts nothing itself but depends on input order — at
    // scale the group order is nondeterministic, so sort for stability
    def finish(b: Buf): Double = Significance.linearness(b.values.sorted.toArray)
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** outstanding1 as an aggregate Column:
    * `df.groupBy(chart).agg(outstanding1(col))`. Order-insensitive
    * (the metric sorts internally). */
  def outstanding1(values: Column): Column =
    udaf(new Outstanding1Agg, Encoders.scalaDouble).apply(values)

  /** linearness as an aggregate Column (values sorted for partition-
    * order independence). */
  def linearness(values: Column): Column =
    udaf(new LinearnessAgg, Encoders.scalaDouble).apply(values)
}
