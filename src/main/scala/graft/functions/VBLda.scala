package graft.functions

/** Deterministic batch variational-Bayes LDA, driver-side and
  * engine-replayable — the fit behind `CoreT.lda`.
  *
  * The reference runs sklearn LatentDirichletAllocation with defaults
  * (Tfunctions.py:46-77: n_components=4, batch VB, doc_topic_prior =
  * topic_word_prior = 1/K, max_iter=10) over rank-count pseudo-docs.
  * sklearn's fit is NONDETERMINISTIC (gamma-distributed random init of
  * both the topic matrix and every doc posterior), so even the
  * reference cannot reproduce its own labels run over run. This is the
  * same mean-field update loop with the randomness replaced by
  * deterministic choices — the same treatment PCA-init gave UMAP:
  *
  *  - topic init: λ_kw = 1 + (draw(k·W+w) − 0.5)/10, a counter-hash
  *    perturbation of the symmetric 1.0 (sklearn: Gamma(100, 0.01),
  *    mean 1, sd 0.1 — same location/scale, no RNG state);
  *  - doc posterior init: γ_dk = α + n_d/K (the symmetric split;
  *    sklearn randomizes it, but the E-step fixed point for a doc
  *    depends only on λ, so this changes the path, not the cluster
  *    structure);
  *  - per-doc E-step: fixed-order updates, mean-change tolerance 1e-3,
  *    at most 30 iterations (sklearn caps at 100; rank-count docs
  *    converge in <10);
  *  - transcendentals through [[MirrorMath]] (digammam/expm), so a
  *    SQL engine replays the fit bit for bit.
  *
  * Everything is +,−,*,/ over fixed iteration orders: the whole fit is
  * a pure function of the (ordered) count matrix.
  */
object VBLda {

  /** Resolution of the λ-init perturbation draws; shared with
    * [[graft.LdaOracle]]'s SQL mirror. */
  private[graft] val InitDrawBound = 1000

  /** draw t ∈ [0, InitDrawBound) via the UMAP counter hash — init
    * perturbation. */
  private def draw1000(t: Long, seed: Long): Double =
    UMAP.draw(t, seed, InitDrawBound).toDouble / InitDrawBound

  /** Fit result: λ (K×W), per-doc topic posteriors γ (n×K). */
  final case class Fit(lambda: Array[Array[Double]], gamma: Array[Array[Double]])

  /** Mean-field E-step for one doc against fixed expElogbeta; returns
    * the converged γ_d. Mirrors sklearn's _update_doc_distribution
    * shape (exp(ψ(γ)−ψ(Σγ)) times the word mix, renormalized through
    * the per-word φ norm), with deterministic init. */
  private[graft] def docEStep(counts: Array[Double], expElogbeta: Array[Array[Double]],
                              alpha: Double, maxIter: Int = 30, tol: Double = 1e-3): Array[Double] = {
    val k = expElogbeta.length
    val w = counts.length
    val nd = counts.sum
    val gamma = Array.fill(k)(alpha + nd / k)
    val expElogtheta = new Array[Double](k)
    val phiNorm = new Array[Double](w)
    var it = 0
    var done = false
    while (it < maxIter && !done) {
      var sumG = 0.0
      var i = 0
      while (i < k) { sumG += gamma(i); i += 1 }
      val psiSum = MirrorMath.digammam(sumG)
      i = 0
      while (i < k) {
        expElogtheta(i) = MirrorMath.expm(MirrorMath.digammam(gamma(i)) - psiSum)
        i += 1
      }
      // φ normalizer per word, hoisted out of the topic loop: it
      // depends only on expElogtheta (fixed for this sweep), so
      // computing it once per word is bit-identical to recomputing it
      // inside the i-loop and drops the sweep from O(k²·w) to O(k·w)
      var j = 0
      while (j < w) {
        var norm = 1e-100 // sklearn's EPS floor on the φ normalizer
        var kk = 0
        while (kk < k) { norm += expElogtheta(kk) * expElogbeta(kk)(j); kk += 1 }
        phiNorm(j) = norm
        j += 1
      }
      var change = 0.0
      i = 0
      while (i < k) {
        // γ_k = α + expElogtheta_k · Σ_w counts_w · expElogbeta_kw / φnorm_w
        var acc = 0.0
        j = 0
        while (j < w) {
          acc += counts(j) * expElogbeta(i)(j) / phiNorm(j)
          j += 1
        }
        val next = alpha + expElogtheta(i) * acc
        change += math.abs(next - gamma(i))
        gamma(i) = next
        i += 1
      }
      if (change / k < tol) done = true
      it += 1
    }
    gamma
  }

  /** Batch VB fit. `docs` must be in canonical (caller-ordered) row
    * order — the fold order is part of the replay contract. */
  def fit(docs: Array[Array[Double]], k: Int = 4, maxIter: Int = 10,
          seed: Long = 9L): Fit = {
    require(docs.nonEmpty, "lda: empty corpus")
    val w = docs(0).length
    val alpha = 1.0 / k
    val eta = 1.0 / k
    val lambda = Array.tabulate(k, w)((i, j) =>
      1.0 + (draw1000(i.toLong * w + j, seed) - 0.5) / 10.0)
    var iter = 0
    var gammas: Array[Array[Double]] = null
    while (iter < maxIter) {
      // expElogbeta from current λ
      val expElogbeta = Array.tabulate(k) { i =>
        var sumL = 0.0
        var j = 0
        while (j < w) { sumL += lambda(i)(j); j += 1 }
        val psiSum = MirrorMath.digammam(sumL)
        Array.tabulate(w)(j => MirrorMath.expm(MirrorMath.digammam(lambda(i)(j)) - psiSum))
      }
      // E-step over docs in order, accumulating sufficient statistics
      val sstats = Array.fill(k, w)(0.0)
      gammas = docs.map { counts =>
        val gamma = docEStep(counts, expElogbeta, alpha)
        // φ_dwk ∝ expElogtheta_k · expElogbeta_kw (recomputed at the
        // converged γ — same quantity sklearn accumulates)
        var sumG = 0.0
        var i = 0
        while (i < k) { sumG += gamma(i); i += 1 }
        val psiSum = MirrorMath.digammam(sumG)
        val expElogtheta = Array.tabulate(k)(i =>
          MirrorMath.expm(MirrorMath.digammam(gamma(i)) - psiSum))
        var j = 0
        while (j < docs(0).length) {
          var norm = 1e-100
          var kk = 0
          while (kk < k) { norm += expElogtheta(kk) * expElogbeta(kk)(j); kk += 1 }
          i = 0
          while (i < k) {
            sstats(i)(j) += counts(j) * expElogtheta(i) * expElogbeta(i)(j) / norm
            i += 1
          }
          j += 1
        }
        gamma
      }
      // M-step: λ = η + sstats
      for (i <- 0 until k; j <- 0 until w) lambda(i)(j) = eta + sstats(i)(j)
      iter += 1
    }
    // final-pass posteriors against the final λ (sklearn's transform
    // re-runs the E-step after fit; doing it here keeps one code path)
    val expElogbeta = Array.tabulate(k) { i =>
      var sumL = 0.0
      var j = 0
      while (j < w) { sumL += lambda(i)(j); j += 1 }
      val psiSum = MirrorMath.digammam(sumL)
      Array.tabulate(w)(j => MirrorMath.expm(MirrorMath.digammam(lambda(i)(j)) - psiSum))
    }
    val finalGammas = docs.map(docEStep(_, expElogbeta, alpha))
    Fit(lambda, finalGammas)
  }

  /** Row label indices: argmax topic per doc (first max wins). */
  def argmaxTopics(fit: Fit): Array[Int] =
    fit.gamma.map { g =>
      var best = 0
      var i = 1
      while (i < g.length) { if (g(i) > g(best)) best = i; i += 1 }
      best
    }

  /** Per-topic top terms: normalized λ row, ordered by (weight desc,
    * index asc) — deterministic where np.argsort's quicksort is not. */
  def topTerms(fit: Fit, n: Int): Array[Seq[(Int, Double)]] =
    fit.lambda.map { row =>
      val sum = row.sum
      row.zipWithIndex.map { case (v, i) => (i, v / sum) }
        .sortBy { case (i, v) => (-v, i) }.take(n).toSeq
    }
}
