package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bloom-filter sizing math that Dedup.incrementalDedup's
  * driver-memory ceiling note quotes: Spark's sketch allocates the
  * optimal m = −n·ln(p)/ln²2 bits (≈ 9.585 bits/item at p = 0.01,
  * ≈ 4.79 at p = 0.1), so the documented figures — ~1.2 GB of driver
  * heap at 10⁹ corpus docs, fpp 0.01 — follow from the formula, and a
  * future Spark upgrade that changed the allocator would fail here
  * rather than silently invalidate the scaladoc.
  */
class BloomSizingSpec extends AnyFunSuite {
  private def optimalBits(n: Long, p: Double): Double =
    -n * math.log(p) / (math.log(2) * math.log(2))

  test("sketch BloomFilter allocates the optimal bit count (±1%, word-rounded)") {
    for ((n, p) <- Seq((1000000L, 0.01), (1000000L, 0.1), (10000000L, 0.01))) {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(n, p)
      val expect = optimalBits(n, p)
      assert(math.abs(bf.bitSize() - expect) / expect < 0.01,
        s"n=$n p=$p: bitSize=${bf.bitSize()} expected≈$expect")
    }
  }

  test("the documented driver ceiling figures follow from the formula") {
    // ~9.585 bits/item at fpp 0.01
    assert(math.abs(optimalBits(1L, 0.01) - 9.585) < 0.01)
    // ~1.2 GB at 1e9 docs, fpp 0.01 (the scaladoc's headline bound)
    val gb1e9 = optimalBits(1000000000L, 0.01) / 8 / 1e9
    assert(gb1e9 > 1.1 && gb1e9 < 1.3, s"1e9@0.01 = $gb1e9 GB")
    // fpp 0.1 halves the filter: ~6 GB at 1e10 docs (vs ~12 at 0.01)
    val gb1e10 = optimalBits(10000000000L, 0.1) / 8 / 1e9
    assert(gb1e10 > 5.5 && gb1e10 < 6.5, s"1e10@0.1 = $gb1e10 GB")
    val ratio = optimalBits(1L, 0.1) / optimalBits(1L, 0.01)
    assert(math.abs(ratio - 0.5) < 0.001)
  }
}
