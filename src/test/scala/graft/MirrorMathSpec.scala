package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MirrorMath

/** MirrorMath must be ACCURATE (it replaces libm in t-SNE's fit) —
  * cross-engine equality is proven empirically by the oracle gate. */
class MirrorMathSpec extends AnyFunSuite {

  test("expm matches Math.exp to 1e-14 relative over the working range") {
    val xs = Seq(-700.0, -50.0, -3.7, -1.0, -1e-9, 0.0, 1e-9, 0.5, 1.0, 10.0, 300.0, 700.0)
    xs.foreach { x =>
      val e = math.exp(x)
      val m = MirrorMath.expm(x)
      assert(math.abs(m - e) <= 1e-14 * math.max(math.abs(e), 1e-300), s"x=$x: $m vs $e")
    }
  }

  test("expm saturates: underflow to 0, overflow to +inf") {
    assert(MirrorMath.expm(-800.0) == 0.0)
    assert(MirrorMath.expm(800.0).isPosInfinity)
  }

  test("logm matches Math.log to 1e-14 relative, including subnormals") {
    val xs = Seq(4.9e-324, 1e-300, 1e-12, 0.001, 0.5, 0.9999999, 1.0000001, 1.5, 2.0, 3.14159, 99.5, 1e300)
    xs.foreach { x =>
      val e = math.log(x)
      val m = MirrorMath.logm(x)
      assert(math.abs(m - e) <= 1e-14 * math.max(math.abs(e), 1.0), s"x=$x: $m vs $e")
    }
    assert(MirrorMath.logm(1.0) == 0.0)
  }

  test("logm edges: non-positive → -inf, +inf → +inf") {
    assert(MirrorMath.logm(0.0).isNegInfinity)
    assert(MirrorMath.logm(-1.0).isNegInfinity)
    assert(MirrorMath.logm(Double.PositiveInfinity).isPosInfinity)
  }

  test("exp/log round-trip: logm(expm(x)) ≈ x") {
    Seq(-20.0, -1.0, 0.0, 1.0, 20.0).foreach { x =>
      assert(math.abs(MirrorMath.logm(MirrorMath.expm(x)) - x) < 1e-13, s"x=$x")
    }
  }

  test("powm matches Math.pow to 1e-13 relative on UMAP's kernel domain") {
    val b = 0.8950608779109733
    val xs = Seq(1e-30, 1e-12, 0.001, 0.449, 1.0, 2.5, 1e4, 1e9)
    for (x <- xs; y <- Seq(b, b - 1.0)) {
      val e = math.pow(x, y)
      val m = MirrorMath.powm(x, y)
      assert(math.abs(m - e) <= 1e-13 * math.abs(e), s"x=$x y=$y: $m vs $e")
    }
    assert(MirrorMath.powm(0.0, b) == 0.0) // logm -inf → expm 0, like Math.pow
  }
}
