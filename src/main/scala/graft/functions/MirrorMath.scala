package graft.functions

/** Engine-mirrorable exp/ln.
  *
  * `java.lang.Math.exp/log` and DuckDB's libm are each accurate to
  * ~1 ulp but NOT bit-identical — and a 1-ulp difference fed into an
  * iterated non-convex optimizer (t-SNE's 500 gradient steps) grows
  * chaotically, so oracle replays of exp/log-consuming fits need the
  * transcendentals themselves to be identical on both engines. These
  * are: only +,-,*,/ (IEEE-exact), exact power-of-2 scaling, and
  * `pow(2, k)` for integer k (exactly representable, returned exactly
  * by both engines' pow). The polynomial evaluations are fixed Horner
  * chains mirrored textually in the SQL ([[graft.OracleSql]]).
  *
  * Standard range-reduction constructions (Cody & Waite; Abramowitz &
  * Stegun series) — public-domain math. Accuracy ~1e-15 relative on
  * the reduced intervals; NOT a drop-in for Math.exp where last-ulp
  * faithfulness to the true value matters — the point is cross-engine
  * equality, not correct rounding.
  */
object MirrorMath {

  private val Ln2 = 0.6931471805599453 // closest double to ln 2
  // Cody & Waite split: Ln2Hi has its low 20 mantissa bits zero, so
  // k·Ln2Hi is EXACT for |k| ≤ 2^20 and the reduction r keeps full
  // precision at any working |x| (fdlibm's constants)
  private val Ln2Hi = 6.93147180369123816490e-01
  private val Ln2Lo = 1.90821492927058770002e-10

  /** exp(x) as 2^k·P(r), k = floor(x/ln2 + 0.5),
    * r = (x − k·ln2hi) − k·ln2lo, P = 13-term Taylor Horner on
    * |r| ≤ ln2/2. */
  def expm(x: Double): Double = {
    if (x < -745.0) return 0.0
    if (x > 709.0) return Double.PositiveInfinity
    val k = math.floor(x / Ln2 + 0.5)
    val r = (x - k * Ln2Hi) - k * Ln2Lo
    // acc = 1 + r/i·(…) for i = 13 … 1
    var acc = 1.0
    var i = 13
    while (i >= 1) { acc = 1.0 + r * acc / i; i -= 1 }
    math.pow(2.0, k) * acc
  }

  /** x^y for x ≥ 0, y finite: expm(y·logm(x)). x = 0 → 0 (logm's
    * −∞ drives expm to 0), matching Math.pow(0, y) for y > 0 — the
    * only pow shape UMAP's kernel uses. NOT correctly rounded (≈1e-14
    * relative); bit-equal to the SQL mirror, which is the point. */
  def powm(x: Double, y: Double): Double = expm(y * logm(x))

  /** digamma ψ(x) for x > 0: ascending recurrence ψ(x) = ψ(x+1) − 1/x
    * until x ≥ 6, then the asymptotic (Bernoulli) series
    * ln x − 1/(2x) − Σ B₂ₙ/(2n·x²ⁿ) to n = 5 — ~1e-14 absolute on
    * x ≥ 6 (Abramowitz & Stegun 6.3.18). Only +,−,*,/ and logm, so
    * the VB-LDA oracle replays it term for term. */
  def digammam(x: Double): Double = {
    // each shifted argument is ONE add from the original x (x + t),
    // never an accumulated x += 1 — accumulation rounds differently
    // from the replay's single adds and desynchronizes low bits
    var v = 0.0
    var t = 0.0
    while (x + t < 6.0) { v -= 1.0 / (x + t); t += 1.0 }
    val xx = x + t
    val inv = 1.0 / xx
    val inv2 = inv * inv
    val series = inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 *
      (1.0 / 252.0 - inv2 * (1.0 / 240.0 - inv2 * (1.0 / 132.0)))))
    v + logm(xx) - 0.5 * inv - series
  }

  /** ln(x) for x > 0 finite: normalize m = x·2^−e into [1,2) by exact
    * halving/doubling (bounded 1100-step loop — covers subnormals),
    * then ln(x) = e·ln2 + 2t·Q(t²), t = (m−1)/(m+1), Q = 17-term
    * atanh-series Horner. The SQL mirror normalizes by binary descent
    * (multiply by 2^±2^k, ~22 exact steps) instead of unit steps —
    * the (m, e) pair with m ∈ [1,2) is unique and every step in both
    * loops is an exact power-of-2 scaling, so the results are
    * bit-identical. */
  def logm(x: Double): Double = {
    if (x <= 0.0) return Double.NegativeInfinity
    if (x.isInfinite) return Double.PositiveInfinity
    var m = x
    var e = 0.0
    var step = 0
    while (step < 1100 && (m >= 2.0 || m < 1.0)) {
      if (m >= 2.0) { m = m * 0.5; e += 1.0 }
      else { m = m * 2.0; e -= 1.0 }
      step += 1
    }
    val t = (m - 1.0) / (m + 1.0)
    val t2 = t * t
    // acc = 1/(2i+1) + t²·acc for i = 16 … 0
    var acc = 0.0
    var i = 16
    while (i >= 0) { acc = 1.0 / (2 * i + 1) + t2 * acc; i -= 1 }
    e * Ln2 + 2.0 * t * acc
  }
}
