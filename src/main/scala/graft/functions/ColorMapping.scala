package graft.functions

/** Chart color assignment — exact port of the reference's RGB math
  * (search.py:850-873, duplicated at 1529-1548 and 415-436) for
  * presentation parity.
  *
  * Nominal: the 10-color "muted" qualitative palette (seaborn's
  * published muted hex values), cycled by category code, with the gray
  * outlier color (config.py:3) appended for -1 labels. Numeric: linear
  * ramp between dark blue [8,48,107] and pale blue [222,235,247] after
  * min-max normalization — `(p0−p1)·v + p1`, replicated exactly.
  */
object ColorMapping {

  val OutlierColor: (Double, Double, Double) = (0.5, 0.5, 0.5)

  /** seaborn "muted" palette, RGB 0-255 (public constants). */
  private val mutedHex = Seq(
    (0x48, 0x78, 0xd0), (0xee, 0x85, 0x4a), (0x6a, 0xcc, 0x64),
    (0xd6, 0x5f, 0x5f), (0x95, 0x6c, 0xb4), (0x8c, 0x61, 0x3c),
    (0xdc, 0x7e, 0xc0), (0x79, 0x79, 0x79), (0xd5, 0xbb, 0x67),
    (0x82, 0xc6, 0xe2))

  /** Palette for `k` categories: first k muted colors (cycled past 10)
    * plus the outlier color as the final entry — indexing mirrors
    * `palette[code % len(palette)]`. */
  def nominalPalette(k: Int): IndexedSeq[(Double, Double, Double)] = {
    val base = (0 until k).map { i =>
      val (r, g, b) = mutedHex(i % mutedHex.length)
      (r / 255.0, g / 255.0, b / 255.0)
    }
    base :+ OutlierColor
  }

  /** Color for one category code (-1 outliers land on the appended
    * gray via the modulo, matching the reference). */
  def nominalColor(code: Int, k: Int): (Double, Double, Double) = {
    val p = nominalPalette(k)
    p(java.lang.Math.floorMod(code, p.size))
  }

  private val rampHi = (8 / 255.0, 48 / 255.0, 107 / 255.0)
  private val rampLo = (222 / 255.0, 235 / 255.0, 247 / 255.0)

  /** Linear 2-color ramp over min-max normalized values
    * (search.py:865-873): c = (hi−lo)·v + lo. */
  def numericColors(values: Array[Double]): Array[(Double, Double, Double)] = {
    val mn = values.min
    val shifted = values.map(_ - mn)
    val mx = shifted.max
    val norm = if (mx == 0) shifted else shifted.map(_ / mx)
    norm.map { v =>
      ((rampHi._1 - rampLo._1) * v + rampLo._1,
        (rampHi._2 - rampLo._2) * v + rampLo._2,
        (rampHi._3 - rampLo._3) * v + rampLo._3)
    }
  }
  def numericLegend: Map[String, (Double, Double, Double)] =
    Map("__Min" -> rampLo, "__Max" -> rampHi)

  /** Distributed twin of [[numericColors]]'s ramp: channel columns for
    * an already-normalized value column, `(hi−lo)·v + lo` with the
    * identical constants and association order — so a corpus-scale
    * color assignment reproduces the driver-side chart math exactly
    * (and a SQL engine computing `8/255.0 − 222/255.0` lands on the
    * same doubles, both operations being correctly rounded). */
  def rampChannels(norm: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions.lit
    def ch(hi: Double, lo: Double) = lit(hi - lo) * norm + lit(lo)
    (ch(rampHi._1, rampLo._1), ch(rampHi._2, rampLo._2), ch(rampHi._3, rampLo._3))
  }

  /** Distributed twin of [[nominalColor]] for NON-NEGATIVE codes: the
    * `k`-dependence of the palette cancels (`palette(code % (k+1)) =
    * muted(code % 10)` whenever `0 ≤ code < k`), so the muted palette
    * cycles directly — outlier (−1) handling stays with the
    * driver-side [[nominalColor]], which the chart path uses. */
  def nominalChannels(code: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions.{array, element_at, lit, pmod}
    def arr(pick: ((Int, Int, Int)) => Int) =
      array(mutedHex.map(c => lit(pick(c) / 255.0)): _*)
    val idx = (pmod(code, lit(mutedHex.length)) + 1).cast("int")
    (element_at(arr(_._1), idx), element_at(arr(_._2), idx), element_at(arr(_._3), idx))
  }

  /** The reference's 4-bucket quantization of a numeric color channel
    * for CDM scoring (search.py:845-846): int(v·4) clamped to 3, after
    * dividing by the max. */
  def cdmBuckets(values: Array[Double]): Array[Long] = {
    val mx = values.max
    val norm = if (mx == 0) values else values.map(_ / mx)
    norm.map(v => if (v < 1) (v * 4).toInt.toLong else 3L)
  }
}
