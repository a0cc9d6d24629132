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
  *  - sufficient statistics accumulate as pinned integers (floor of
  *    contribution·2^36, the PCA moment-pin trick) — exact and
  *    commutative, so the fit is a pure function of the doc MULTISET
  *    and the E-step distributes over any partitioning bit-exactly.
  *
  * Everything else is +,−,*,/ over fixed iteration orders.
  */
object VBLda {

  /** Resolution of the λ-init perturbation draws; shared with
    * [[graft.LdaOracle]]'s SQL mirror. */
  private[graft] val InitDrawBound = 1000

  /** Sufficient-statistics fixed-point pin (2^36, same trick as PCA's
    * 2^40 moment pin, sized down so the gate oracle's integer totals
    * stay < 2^53 in DuckDB double slots): each per-doc contribution is
    * floored to an integer multiple of 2^-36 and the INTEGERS are
    * summed, so the total — and therefore the whole fit — is exact,
    * order-free, and partition-independent. Counts are percentile
    * buckets ≤ 100, so one pinned contribution is < 2^43; hi/lo long
    * splits keep partition sums overflow-safe to ~10^12 docs. */
  private[graft] val SStatsPinScale: Double = 68719476736.0
  private val PinLoBits = 20
  private val PinLoMask = (1L << PinLoBits) - 1L

  /** Per-doc E-step + pinned sufficient-statistics contributions:
    * returns floor(counts_j · eet_i · eeb_ij / φnorm_j · 2^36) laid out
    * [i·w + j]. Pure function of (counts, expElogbeta) — the unit both
    * the driver fit and the distributed E-step share. */
  private[graft] def docPinnedStats(counts: Array[Double],
                                    expElogbeta: Array[Array[Double]],
                                    alpha: Double): Array[Long] = {
    val k = expElogbeta.length
    val w = counts.length
    val gamma = docEStep(counts, expElogbeta, alpha)
    var sumG = 0.0
    var i = 0
    while (i < k) { sumG += gamma(i); i += 1 }
    val psiSum = MirrorMath.digammam(sumG)
    val expElogtheta = Array.tabulate(k)(i =>
      MirrorMath.expm(MirrorMath.digammam(gamma(i)) - psiSum))
    val pins = new Array[Long](k * w)
    var j = 0
    while (j < w) {
      var norm = 1e-100
      var kk = 0
      while (kk < k) { norm += expElogtheta(kk) * expElogbeta(kk)(j); kk += 1 }
      i = 0
      while (i < k) {
        pins(i * w + j) =
          math.floor(counts(j) * expElogtheta(i) * expElogbeta(i)(j) / norm * SStatsPinScale).toLong
        i += 1
      }
      j += 1
    }
    pins
  }

  /** Add a doc's pinned contributions into a hi/lo accumulator
    * (layout [hi_0, lo_0, hi_1, lo_1, …]). */
  private[graft] def addPinned(acc: Array[Long], pins: Array[Long]): Unit = {
    var c = 0
    while (c < pins.length) {
      acc(2 * c) += pins(c) >> PinLoBits
      acc(2 * c + 1) += pins(c) & PinLoMask
      c += 1
    }
  }

  /** Reassemble one hi/lo cell into the exact real total / 2^36. */
  private[graft] def unpin(hi: Long, lo: Long): Double =
    ((BigInt(hi) << PinLoBits) + BigInt(lo)).toDouble / SStatsPinScale

  /** The ONE batch-EM driver both fit paths run: init λ, then maxIter
    * times — expElogbeta from λ, caller-supplied pinned-stat
    * accumulation (a sequential fold in [[fit]], a broadcast +
    * mapPartitions reduce in [[graft.operators.CoreT.lda]]), M-step
    * λ = η + unpin(stats). Because the arithmetic lives only here,
    * the distributed operator cannot drift from the fit the DuckDB
    * oracle replays.
    * @param accumulate expElogbeta ⇒ hi/lo accumulator (layout of
    *                   [[addPinned]]) summing every doc's
    *                   [[docPinnedStats]]
    */
  private[graft] def emLoop(k: Int, w: Int, seed: Long, maxIter: Int)(
      accumulate: Array[Array[Double]] => Array[Long]): Array[Array[Double]] = {
    val eta = 1.0 / k
    val lambda = lambdaInit(k, w, seed)
    var iter = 0
    while (iter < maxIter) {
      val acc = accumulate(expElogbetaOf(lambda))
      for (i <- 0 until k; j <- 0 until w)
        lambda(i)(j) = eta + unpin(acc(2 * (i * w + j)), acc(2 * (i * w + j) + 1))
      iter += 1
    }
    lambda
  }

  /** expElogbeta (exp(ψ(λ)−ψ(Σ_w λ)) per topic row) from λ — the k×w
    * broadcast the E-step runs against. */
  private[graft] def expElogbetaOf(lambda: Array[Array[Double]]): Array[Array[Double]] = {
    val w = lambda(0).length
    Array.tabulate(lambda.length) { i =>
      var sumL = 0.0
      var j = 0
      while (j < w) { sumL += lambda(i)(j); j += 1 }
      val psiSum = MirrorMath.digammam(sumL)
      Array.tabulate(w)(j => MirrorMath.expm(MirrorMath.digammam(lambda(i)(j)) - psiSum))
    }
  }

  /** Deterministic λ init: counter-hash perturbation of symmetric 1. */
  private[graft] def lambdaInit(k: Int, w: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(k, w)((i, j) =>
      1.0 + (draw1000(i.toLong * w + j, seed) - 0.5) / 10.0)

  /** draw t ∈ [0, InitDrawBound) via the UMAP counter hash — init
    * perturbation. */
  private def draw1000(t: Long, seed: Long): Double =
    UMAP.draw(t, seed, InitDrawBound).toDouble / InitDrawBound

  /** Fit result: λ (K×W), per-doc topic posteriors γ (n×K). */
  final case class Fit(lambda: Array[Array[Double]], gamma: Array[Array[Double]])

  /** sklearn's max_iter default — shared by [[fit]] and the
    * distributed EM loop in [[graft.operators.CoreT.lda]]. */
  val DefaultMaxIter = 10

  /** First max wins (np.argmax tie behavior). */
  private[graft] def argmax(g: Array[Double]): Int = {
    var best = 0
    var i = 1
    while (i < g.length) { if (g(i) > g(best)) best = i; i += 1 }
    best
  }

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

  /** Batch VB fit. Since round 6 the sufficient statistics accumulate
    * as pinned integers ([[SStatsPinScale]]), so the fit is a pure
    * function of the MULTISET of docs — doc order no longer matters,
    * and [[graft.operators.CoreT.lda]]'s distributed E-step produces
    * these exact λ on any partitioning. */
  def fit(docs: Array[Array[Double]], k: Int = 4, maxIter: Int = DefaultMaxIter,
          seed: Long = 9L): Fit = {
    require(docs.nonEmpty, "lda: empty corpus")
    val w = docs(0).length
    val alpha = 1.0 / k
    // E-step: per-doc converged posteriors → pinned φ statistics
    // (φ_dwk ∝ expElogtheta_k · expElogbeta_kw at the converged γ —
    // the same quantity sklearn accumulates, floored to 2^-36)
    val lambda = emLoop(k, w, seed, maxIter) { expElogbeta =>
      val acc = new Array[Long](2 * k * w)
      docs.foreach(counts => addPinned(acc, docPinnedStats(counts, expElogbeta, alpha)))
      acc
    }
    // final-pass posteriors against the final λ (sklearn's transform
    // re-runs the E-step after fit; doing it here keeps one code path)
    val expElogbeta = expElogbetaOf(lambda)
    val finalGammas = docs.map(docEStep(_, expElogbeta, alpha))
    Fit(lambda, finalGammas)
  }

  /** Row label indices: argmax topic per doc (first max wins). */
  def argmaxTopics(fit: Fit): Array[Int] = fit.gamma.map(argmax)

  /** Per-topic top terms: normalized λ row, ordered by (weight desc,
    * index asc) — deterministic where np.argsort's quicksort is not. */
  def topTerms(fit: Fit, n: Int): Array[Seq[(Int, Double)]] =
    fit.lambda.map { row =>
      val sum = row.sum
      row.zipWithIndex.map { case (v, i) => (i, v / sum) }
        .sortBy { case (i, v) => (-v, i) }.take(n).toSeq
    }
}
