package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UMAP

/** Embedding QUALITY at the operator's 300-epoch default — the path the
  * q_coret_umap gate does NOT exercise (the gate pins
  * [[UmapOracle.GateEpochs]] = 30 for oracle budget and checks replay
  * exactness, not convergence; see the MLQueries comment). This spec
  * pins neighborhood preservation so a regression in the SGD/schedule
  * can't hide behind a still-bit-exact shorter replay.
  */
class UmapQualitySpec extends AnyFunSuite {

  /** Two well-separated deterministic blobs in 2-d (no RNG — jitter is
    * a fixed low-discrepancy lattice so the test is exactly repeatable). */
  private def blobs(perBlob: Int): (Array[Array[Double]], Array[Int]) = {
    def jitter(i: Int): (Double, Double) =
      (((i * 13) % perBlob).toDouble / perBlob * 0.08,
        ((i * 7) % perBlob).toDouble / perBlob * 0.08)
    val a = Array.tabulate(perBlob) { i =>
      val (dx, dy) = jitter(i); Array(0.1 + dx, 0.1 + dy)
    }
    val b = Array.tabulate(perBlob) { i =>
      val (dx, dy) = jitter(i); Array(0.9 + dx, 0.9 + dy)
    }
    (a ++ b, Array.fill(perBlob)(0) ++ Array.fill(perBlob)(1))
  }

  test("300-epoch default keeps two separated blobs separated (kNN purity ≥ 0.9)") {
    val (pts, label) = blobs(30)
    val y = UMAP.embed(pts) // operator defaults: nNeighbors=15, epochs=300
    assert(y.length == pts.length)
    assert(y.forall(p => java.lang.Double.isFinite(p(0)) && java.lang.Double.isFinite(p(1))))

    // kNN purity in the EMBEDDING: fraction of points whose 5 nearest
    // embedded neighbors share the point's blob label
    def d2(i: Int, j: Int): Double = {
      val dx = y(i)(0) - y(j)(0); val dy = y(i)(1) - y(j)(1)
      dx * dx + dy * dy
    }
    val n = y.length
    val pure = (0 until n).count { i =>
      val nn = (0 until n).filter(_ != i).sortBy(d2(i, _)).take(5)
      nn.forall(j => label(j) == label(i))
    }
    assert(pure.toDouble / n >= 0.9, s"kNN purity ${pure.toDouble / n}")

    // and the blobs' embedded centroids are farther apart than either
    // blob's internal spread (separation survives the embedding)
    def centroid(l: Int): (Double, Double) = {
      val idx = (0 until n).filter(label(_) == l)
      (idx.map(y(_)(0)).sum / idx.size, idx.map(y(_)(1)).sum / idx.size)
    }
    def spread(l: Int): Double = {
      val (cx, cy) = centroid(l)
      val idx = (0 until n).filter(label(_) == l)
      idx.map(i => math.sqrt((y(i)(0) - cx) * (y(i)(0) - cx) +
        (y(i)(1) - cy) * (y(i)(1) - cy))).sum / idx.size
    }
    val (c0x, c0y) = centroid(0); val (c1x, c1y) = centroid(1)
    val between = math.sqrt((c0x - c1x) * (c0x - c1x) + (c0y - c1y) * (c0y - c1y))
    assert(between > 2.0 * math.max(spread(0), spread(1)),
      s"between=$between spreads=${spread(0)},${spread(1)}")
  }
}
