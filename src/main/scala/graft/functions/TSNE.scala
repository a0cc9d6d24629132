package graft.functions

/** Exact t-SNE (van der Maaten & Hinton 2008), driver-side.
  *
  * The reference calls sklearn TSNE with `method="exact", perplexity=5,
  * init="pca"` for its <100-row tables (Tfunctions.py:18-25). This is
  * the same algorithm: per-point binary search of the Gaussian
  * bandwidth to hit the target perplexity, symmetrized affinities with
  * early exaggeration, gradient descent with momentum on the
  * Student-t low-dimensional similarities. PCA init (power iteration)
  * makes the whole run deterministic — no RNG anywhere.
  *
  * O(n²) per iteration: bounded-input operator (chart feeder), like
  * DBSCAN/MDS in [[graft.operators.CoreT]].
  */
object TSNE {

  def embed(points: Array[Array[Double]], perplexity: Double = 5.0,
            iterations: Int = 500, learningRate: Double = 200.0): Array[Array[Double]] = {
    val n = points.length
    if (n == 0) return Array.empty
    if (n == 1) return Array(Array(0.0, 0.0))

    // pairwise squared distances
    val d2 = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- (i + 1) until n) {
      var s = 0.0
      var k = 0
      while (k < points(i).length) {
        val diff = points(i)(k) - points(j)(k); s += diff * diff; k += 1
      }
      d2(i)(j) = s; d2(j)(i) = s
    }

    // P matrix: binary-search beta per row for target perplexity.
    // exp/ln are MirrorMath (engine-mirrorable), the entropy uses the
    // Shannon identity H = ln S + β·(Σ d²e)/S (one ln per try — also
    // what sklearn's _binary_search_perplexity computes), and the final
    // row is rebuilt from the last TRIED beta — all so the DuckDB
    // oracle can replay the bisection path decision-for-decision.
    val targetH = MirrorMath.logm(math.min(perplexity, n - 1.0))
    val p = Array.ofDim[Double](n, n)
    for (i <- 0 until n) {
      var betaMin = Double.NegativeInfinity
      var betaMax = Double.PositiveInfinity
      var beta = 1.0
      var betaUsed = 1.0
      var tries = 0
      var done = false
      while (!done && tries < 50) {
        betaUsed = beta
        var sum = 0.0
        var dsum = 0.0
        for (j <- 0 until n if j != i) {
          val e = MirrorMath.expm(-d2(i)(j) * beta)
          sum += e
          dsum += d2(i)(j) * e
        }
        if (sum <= 0) sum = Double.MinPositiveValue
        val h = MirrorMath.logm(sum) + beta * dsum / sum
        if (math.abs(h - targetH) < 1e-5) done = true
        else if (h > targetH) { betaMin = beta; beta = if (betaMax.isInfinity) beta * 2 else (beta + betaMax) / 2 }
        else { betaMax = beta; beta = if (betaMin.isInfinity) beta / 2 else (beta + betaMin) / 2 }
        tries += 1
      }
      var sum = 0.0
      for (j <- 0 until n if j != i) { p(i)(j) = MirrorMath.expm(-d2(i)(j) * betaUsed); sum += p(i)(j) }
      if (sum <= 0) sum = Double.MinPositiveValue
      for (j <- 0 until n if j != i) p(i)(j) = p(i)(j) / sum
    }
    // symmetrize (each conditional row already sums to 1, so pSym sums
    // to 1 by construction — no normalization pass follows)
    val pSym = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- 0 until n if i != j)
      pSym(i)(j) = (p(i)(j) + p(j)(i)) / (2.0 * n)

    // deterministic PCA init to 2 components (power iteration on the
    // centered covariance — matches init="pca" determinism)
    val y = pcaInit(points)

    // gradient descent
    val dy = Array.ofDim[Double](n, 2)
    val prev = Array.ofDim[Double](n, 2)
    val q = Array.ofDim[Double](n, n)
    for (iter <- 0 until iterations) {
      val exaggeration = if (iter < 100) 4.0 else 1.0
      val momentum = if (iter < 250) 0.5 else 0.8
      // q matrix
      var qTot = 0.0
      for (i <- 0 until n; j <- (i + 1) until n) {
        val dx = y(i)(0) - y(j)(0); val dyv = y(i)(1) - y(j)(1)
        val num = 1.0 / (1.0 + dx * dx + dyv * dyv)
        q(i)(j) = num; q(j)(i) = num; qTot += 2 * num
      }
      // gradient
      for (i <- 0 until n) {
        var g0 = 0.0; var g1 = 0.0
        for (j <- 0 until n if j != i) {
          val mult = (exaggeration * pSym(i)(j) - q(i)(j) / qTot) * q(i)(j)
          g0 += mult * (y(i)(0) - y(j)(0))
          g1 += mult * (y(i)(1) - y(j)(1))
        }
        dy(i)(0) = 4 * g0; dy(i)(1) = 4 * g1
      }
      for (i <- 0 until n; c <- 0 until 2) {
        val step = momentum * prev(i)(c) - learningRate * dy(i)(c)
        prev(i)(c) = step
        y(i)(c) += step
      }
      // recenter
      val m0 = y.map(_(0)).sum / n; val m1 = y.map(_(1)).sum / n
      for (i <- 0 until n) { y(i)(0) -= m0; y(i)(1) -= m1 }
    }
    y
  }

  /** Top-2 principal components ([[PowerPca.top2]], the shared
    * bit-exact core), scaled small — sklearn scales pca init to
    * 1e-4 std. */
  private def pcaInit(points: Array[Array[Double]]): Array[Array[Double]] = {
    val (c1, c2) = PowerPca.top2(points)
    def std(a: Array[Double]): Double = {
      val m = a.sum / a.length
      math.sqrt(a.map(v => (v - m) * (v - m)).sum / a.length)
    }
    val s1 = if (std(c1) > 0) 1e-4 / std(c1) else 1.0
    val s2 = if (std(c2) > 0) 1e-4 / std(c2) else 1.0
    Array.tabulate(points.length)(i => Array(c1(i) * s1, c2(i) * s2))
  }
}
