package graft.functions

/** UMAP (McInnes, Healy & Melville 2018), driver-side, fully
  * deterministic, and engine-replayable.
  *
  * The reference runs umap-learn with library defaults
  * (Tfunctions.py:33-37, wrapper Tengine.py:170-176) over its ≤400-row
  * charts. This is the same algorithm at that scale: exact kNN graph,
  * smoothed-distance fuzzy simplicial set (per-point rho/sigma with the
  * log2(k) calibration), probabilistic t-conorm symmetrization, and the
  * standard per-edge SGD with negative sampling on the a/b rational
  * kernel. Departures that keep it reproducible across runs, JVMs, AND
  * SQL engines (the DuckDB oracle replays the whole fit bit-exactly,
  * see [[graft.UmapOracle]]):
  *  - PCA initialization (umap-learn's spectral init up to
  *    sign/rotation; init choice does not change neighbor structure);
  *  - a counter-based quadratic-congruential hash for negative
  *    sampling instead of a stateful RNG — draw t depends only on
  *    (seed, t), so a replay can compute any draw directly from the
  *    firing event's position (all intermediates < 2^62: exact in
  *    Long and in DuckDB BIGINT);
  *  - the per-edge schedule tracks an integer fire count k and tests
  *    eps·(k+1) ≤ epoch (single multiply) instead of accumulating
  *    nextDue += eps — same schedule up to float rounding, but
  *    closed-form recoverable from (eps, epoch) by any engine;
  *  - exp/ln/pow go through [[MirrorMath]] (engine-mirrorable
  *    transcendentals); sqrt is IEEE-correctly-rounded everywhere.
  *
  * O(n²) kNN + O(edges·epochs) SGD: bounded-input chart feeder like
  * DBSCAN/MDS/t-SNE in [[graft.operators.CoreT]].
  */
object UMAP {

  // Rational-kernel coefficients fit for min_dist=0.1, spread=1.0 —
  // umap-learn's find_ab_params output for its defaults.
  private[graft] val A = 1.5769434603113077
  private[graft] val B = 0.8950608779109733

  /** Negative-sampling draw t (0-based) → index in [0, bound): two
    * MINSTD multiplies around a quadratic squaring step, all mod the
    * prime 2^31−1. Nonlinear in t (a pure LCG of the counter would be
    * an affine map with lattice artifacts); every intermediate stays
    * below 2^62, so DuckDB BIGINT arithmetic replays it exactly. */
  private[graft] def draw(t: Long, seed: Long, bound: Int): Int = {
    val p = 2147483647L
    val x0 = (t + drawOffset(seed)) % p
    val x1 = 48271L * x0 % p
    val x2 = (x1 * x1 + 12345L) % p
    val x3 = 48271L * x2 % p
    (x3 % bound).toInt
  }

  /** Fit intermediates, exposed so specs and the oracle dev harness
    * can check the SQL replay stage by stage. */
  private[graft] case class Trace(
    knn: Array[Array[Int]], rho: Array[Double], sigma: Array[Double],
    edges: Array[((Int, Int), Double)], maxW: Double,
    init: Array[Array[Double]], firings: Long, y: Array[Array[Double]])

  /** Default draw seed — the reference's kmeans seed 9 (Tfunctions.py:98)
    * reused engine-wide. [[graft.UmapOracle]] derives its SQL draw
    * offset from this (draw adds `1 + seed % 65536`), so operator and
    * oracle cannot drift independently. */
  private[graft] val DefaultSeed = 9L

  /** The SQL-side additive offset `draw` applies to the counter. */
  private[graft] def drawOffset(seed: Long): Long = 1L + (seed % 65536L)

  def embed(points: Array[Array[Double]], nNeighbors: Int = 15,
            epochs: Int = 300, seed: Long = DefaultSeed): Array[Array[Double]] =
    embedTraced(points, nNeighbors, epochs, seed).y

  private[graft] def embedTraced(points: Array[Array[Double]], nNeighbors: Int = 15,
            epochs: Int = 300, seed: Long = DefaultSeed): Trace = {
    def empty(y: Array[Array[Double]]) =
      Trace(Array.empty, Array.empty, Array.empty, Array.empty, 0.0, y, 0L, y)
    val n = points.length
    if (n == 0) return empty(Array.empty)
    if (n == 1) return empty(Array(Array(0.0, 0.0)))
    val k = math.min(nNeighbors, n - 1)

    // exact kNN (bounded input): per-point k smallest distances
    val dist = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- (i + 1) until n) {
      var s = 0.0; var c = 0
      while (c < points(i).length) {
        val diff = points(i)(c) - points(j)(c); s += diff * diff; c += 1
      }
      val d = math.sqrt(s)
      dist(i)(j) = d; dist(j)(i) = d
    }
    val knn = Array.tabulate(n) { i =>
      (0 until n).filter(_ != i).sortBy(j => (dist(i)(j), j)).take(k).toArray
    }

    // fuzzy simplicial set: rho = nearest nonzero distance; sigma via
    // binary search so sum_j exp(-(d - rho)/sigma) = log2(k).
    // MirrorMath exp/ln: a 1-ulp engine difference here would change
    // the bisection path and desynchronize the oracle replay.
    val target = MirrorMath.logm(k.toDouble) / MirrorMath.logm(2.0)
    val rhos = new Array[Double](n)
    val sigmas = new Array[Double](n)
    val weights = new scala.collection.mutable.HashMap[(Int, Int), Double]
    for (i <- 0 until n) {
      val ds = knn(i).map(dist(i)(_))
      val rho = ds.find(_ > 0.0).getOrElse(0.0)
      var lo = 0.0; var hi = Double.PositiveInfinity; var sigma = 1.0
      var it = 0
      while (it < 64) {
        val sum = ds.map(d => MirrorMath.expm(-math.max(0.0, d - rho) / sigma)).sum
        if (math.abs(sum - target) < 1e-5) it = 64
        else {
          if (sum > target) { hi = sigma; sigma = (lo + sigma) / 2 }
          else { lo = sigma; sigma = if (hi.isInfinity) sigma * 2 else (sigma + hi) / 2 }
        }
        it += 1
      }
      rhos(i) = rho; sigmas(i) = sigma
      knn(i).foreach { j =>
        weights((i, j)) = MirrorMath.expm(-math.max(0.0, dist(i)(j) - rho) / sigma)
      }
    }
    // symmetrize: w = a + b - ab (probabilistic t-conorm)
    val sym = new scala.collection.mutable.HashMap[(Int, Int), Double]
    weights.foreach { case ((i, j), w) =>
      val back = weights.getOrElse((j, i), 0.0)
      val (lo, hi) = if (i < j) (i, j) else (j, i)
      sym((lo, hi)) = w + back - w * back
    }
    val edges = sym.toArray.sortBy(_._1) // deterministic iteration order
    val maxW = edges.map(_._2).max

    val y = pcaInit(points, scale = 10.0)

    // per-edge SGD with negative sampling (umap-learn optimize_layout):
    // edge fires every maxW/w epochs (at most once per epoch); 5
    // negatives per positive. The schedule is CLOSED-FORM: cumulative
    // firings after epoch t are min(t, floor(t/eps)), and the edge
    // fires at t iff that count increments. umap-learn accumulates
    // epoch_of_next_sample += eps instead — same cadence up to float
    // rounding, but an accumulation can only be replayed by re-running
    // it, while this form lets any engine test a given (edge, epoch)
    // pair with one division. The draw counter advances 5 per firing
    // (skipped m == i/j draws still consume), so draw t for any firing
    // is 5·(firing ordinal) + s.
    val epochsPerSample = edges.map { case (_, w) => maxW / w }
    val negRate = 5
    var drawT = 0L
    val init = y.map(_.clone())
    def clip(v: Double): Double = math.max(-4.0, math.min(4.0, v))
    def firesThrough(t: Int, eps: Double): Double =
      math.min(t.toDouble, math.floor(t / eps))
    for (epoch <- 1 to epochs) {
      val alpha = 1.0 - (epoch - 1).toDouble / epochs
      var e = 0
      while (e < edges.length) {
        val eps = epochsPerSample(e)
        if (firesThrough(epoch, eps) > firesThrough(epoch - 1, eps)) {
          val (i, j) = edges(e)._1
          // attraction i<->j
          val dx = y(i)(0) - y(j)(0); val dy = y(i)(1) - y(j)(1)
          val d2 = dx * dx + dy * dy
          if (d2 > 0.0) {
            // distances² are floored at 1e-30 before the kernel pow:
            // keeps ln-args out of the subnormal range (the SQL
            // replay's 7-step exponent descent covers [2^-100, 2^128])
            // and is semantically invisible — it binds only when two
            // embedded points sit < 1e-15 apart, where the clipped
            // step is ~1e-12 either way
            val d2c = math.max(d2, 1e-30)
            val g = (-2.0 * A * B * MirrorMath.powm(d2c, B - 1.0)) / (1.0 + A * MirrorMath.powm(d2c, B))
            val g0 = clip(g * dx) * alpha; val g1 = clip(g * dy) * alpha
            y(i)(0) += g0; y(i)(1) += g1
            y(j)(0) -= g0; y(j)(1) -= g1
          }
          // repulsion from sampled non-neighbors of i
          var s = 0
          while (s < negRate) {
            val m = draw(drawT, seed, n)
            drawT += 1
            if (m != i && m != j) {
              val rx = y(i)(0) - y(m)(0); val ry = y(i)(1) - y(m)(1)
              val rd2 = math.max(rx * rx + ry * ry, 1e-30)
              val g = (2.0 * B) / ((0.001 + rd2) * (1.0 + A * MirrorMath.powm(rd2, B)))
              y(i)(0) += clip(g * rx) * alpha
              y(i)(1) += clip(g * ry) * alpha
            }
            s += 1
          }
        }
        e += 1
      }
    }
    // recenter for presentation parity with the other embeddings
    val m0 = y.map(_(0)).sum / n; val m1 = y.map(_(1)).sum / n
    y.foreach { p => p(0) -= m0; p(1) -= m1 }
    Trace(knn, rhos, sigmas, edges, maxW, init, drawT / negRate, y)
  }

  /** Top-2 PCA projection ([[PowerPca.top2]], the shared bit-exact
    * core), scaled so the widest component spans ~[-scale, scale]. */
  private def pcaInit(points: Array[Array[Double]], scale: Double): Array[Array[Double]] = {
    val (c1, c2) = PowerPca.top2(points)
    val span = math.max(c1.map(math.abs).max, math.max(c2.map(math.abs).max, 1e-12))
    Array.tabulate(points.length)(i => Array(c1(i) / span * scale, c2(i) / span * scale))
  }
}
