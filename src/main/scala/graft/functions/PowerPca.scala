package graft.functions

/** Deterministic top-2 PCA via deflated power iteration — the shared
  * init of the t-SNE and UMAP fits ([[TSNE.embed]], [[UMAP.embed]]).
  *
  * BIT-EXACTNESS IS LOAD-BEARING: both embeddings' DuckDB oracles
  * replay this exact operation sequence (mean-centering with
  * ascending-row sums, the fixed 1/(k+1) start vector, 100 deflated
  * iterations, `x·v` folds in row order), so the one implementation
  * here is what keeps the two fits — and their SQL replays — from
  * drifting apart numerically. Callers apply their own final scaling
  * (t-SNE: 1e-4-std; UMAP: span-based), which is the only part that
  * ever differed.
  */
private[functions] object PowerPca {

  /** @return (c1, c2): the centered data's projections onto the top-2
    *         power-iteration components, in input row order. */
  def top2(points: Array[Array[Double]]): (Array[Double], Array[Double]) = {
    val n = points.length
    val d = points(0).length
    val means = Array.tabulate(d)(k => points.map(_(k)).sum / n)
    val x = points.map(p => Array.tabulate(d)(k => p(k) - means(k)))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var k = 0
      while (k < a.length) { s += a(k) * b(k); k += 1 }; s
    }
    def powerIter(deflate: Option[Array[Double]]): Array[Double] = {
      var v = Array.tabulate(d)(k => 1.0 / (k + 1)) // fixed start
      for (_ <- 0 until 100) {
        deflate.foreach { u => val c = dot(v, u); for (k <- 0 until d) v(k) -= c * u(k) }
        val xv = x.map(r => dot(r, v))
        val next = Array.tabulate(d)(k => x.zip(xv).map { case (r, s) => r(k) * s }.sum)
        val norm = math.sqrt(dot(next, next))
        v = if (norm > 0) next.map(_ / norm) else v
      }
      v
    }
    val v1 = powerIter(None)
    val v2 = powerIter(Some(v1))
    (x.map(r => dot(r, v1)), x.map(r => dot(r, v2)))
  }
}
