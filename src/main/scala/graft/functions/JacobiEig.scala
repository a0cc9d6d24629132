package graft.functions

/** Deterministic cyclic Jacobi eigendecomposition for the tiny d×d
  * symmetric matrices the chart transforms produce (PCA covariance,
  * MDS Gram — d is the feature count, never the row count).
  *
  * Exists instead of Breeze/LAPACK so the DuckDB oracle can replay the
  * decomposition bit-for-bit: a FIXED number of row-major sweeps, and
  * every operation is +,-,*,/ or sqrt — all IEEE-754-exact and
  * identical across engines (no atan/hypot, whose libm implementations
  * differ in ulps). Convergence is quadratic; `sweeps = 12` reaches
  * machine precision for any d ≤ 8 long before the budget runs out,
  * and post-convergence sweeps are stable (apq is exactly 0 → identity
  * rotation on both sides).
  *
  * Rotation formulas are the classical ones (Golub & Van Loan §8.5 /
  * Numerical Recipes §11.1, public-domain math): t = sgn(θ)/(|θ| +
  * √(θ²+1)), c = 1/√(t²+1), s = t·c, with sgn(0) = +1. All updates
  * read the pre-rotation snapshot, matching the SQL fold's semantics.
  */
object JacobiEig {

  /** Returns (eigenvalues, V) where `eigenvalues(j)` pairs with column
    * j of V (`V(i)(j)` = component i of eigenvector j). Unsorted —
    * callers pick/order components themselves. `a0` must be symmetric;
    * it is not mutated. */
  def eigSym(a0: Array[Array[Double]], sweeps: Int = 12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val A = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val V = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < sweeps) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          val apq = A(p)(q)
          if (apq != 0.0) {
            val app = A(p)(p)
            val aqq = A(q)(q)
            val theta = (aqq - app) / (2.0 * apq)
            val sgn = if (theta >= 0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            val ap = Array.tabulate(d)(k => A(p)(k))
            val aq = Array.tabulate(d)(k => A(q)(k))
            var k = 0
            while (k < d) {
              if (k != p && k != q) {
                val npk = c * ap(k) - s * aq(k)
                val nqk = s * ap(k) + c * aq(k)
                A(p)(k) = npk; A(k)(p) = npk
                A(q)(k) = nqk; A(k)(q) = nqk
              }
              k += 1
            }
            A(p)(p) = app - t * apq
            A(q)(q) = aqq + t * apq
            A(p)(q) = 0.0; A(q)(p) = 0.0
            k = 0
            while (k < d) {
              val vkp = V(k)(p)
              val vkq = V(k)(q)
              V(k)(p) = c * vkp - s * vkq
              V(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => A(i)(i)), V)
  }

  /** Deterministic start vector for [[powerTop]]: a Knuth
    * multiplicative hash mapped to [-0.5, 0.5). Pure BIGINT arithmetic
    * (exact in any engine); virtually never orthogonal to the target
    * eigenvector, unlike the all-ones vector (which is in the NULL
    * space of a double-centered Gram matrix). 1-based `i`. */
  def startComponent(i: Long): Double =
    (i * 2654435761L % 1000003L).toDouble / 1000003.0 - 0.5

  /** Dominant eigenpair by fixed-iteration power iteration — the n×n
    * companion to [[eigSym]] for matrices too large for a SQL Jacobi
    * replay (MDS Gram, n = row cap). Same contract: only +,-,*,/,sqrt,
    * a FIXED iteration count, ascending-index folds — so a DuckDB
    * `list_reduce` replays it bit-for-bit. Convergence is linear in
    * λ2/λ1; `iters = 300` is ample for visualization-grade coords, and
    * parity holds regardless of convergence because both engines run
    * the identical sequence. Deflate with
    * `b(i)(j) - lambda * v(i) * v(j)` and call again for the runner-up. */
  def powerTop(b: Array[Array[Double]], iters: Int = 300): (Double, Array[Double]) = {
    val n = b.length
    var v = Array.tabulate(n)(i => startComponent(i + 1L))
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(n) { i =>
        var s = 0.0; var j = 0
        while (j < n) { s += b(i)(j) * v(j); j += 1 }
        s
      }
      var s2 = 0.0; var i = 0
      while (i < n) { s2 += w(i) * w(i); i += 1 }
      val nrm = math.sqrt(s2)
      v = if (nrm == 0) w else w.map(_ / nrm)
      it += 1
    }
    val bv = Array.tabulate(n) { i =>
      var s = 0.0; var j = 0
      while (j < n) { s += b(i)(j) * v(j); j += 1 }
      s
    }
    var lam = 0.0
    var i = 0
    while (i < n) { lam += v(i) * bv(i); i += 1 }
    (lam, v)
  }
}
