package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distilled linear quality model — the classifier-distillation
  * pattern every large-corpus pipeline runs: an expensive per-document
  * signal (here the corpus-LM OOV rate, [[PipelineOps.rareTokenSignals]]
  * — the perplexity-filter stand-in) is regressed onto cheap surface
  * features (alpha ratio, stopword ratio, mean token length), and the
  * resulting 4-weight model scores every document in one expression
  * scan. At 100 TB you fit once (one aggregate) and keep ONLY the
  * cheap scan for all future crawls; the residual column flags
  * documents whose cheap signals disagree with the expensive one —
  * exactly the rows worth re-screening.
  *
  * Fit = ridge regression by normal equations:
  *   (XᵀX + λI) w = Xᵀy,  X = [1, alpha, stop, mtl/20],  λ = 2⁻¹⁰.
  * The 10 Gram + 4 moment sums are ORDER-FREE exact integers — every
  * product is quantized to 2⁻⁴⁰ units and summed as split longs
  * ([[CoreT.pinnedParts]], the PCA machinery) — so the fit does not
  * depend on partitioning; the 4×4 solve is a fixed-order Gaussian
  * elimination WITHOUT pivoting (safe: the Gram matrix of a
  * ones-leading feature map is positive semi-definite and λ makes it
  * positive definite) run once driver-side. Weights enter the scoring
  * scan as plan literals.
  *
  * Everything is replayed term-for-term by the DuckDB oracle
  * (ExtQueries.qualityModelOracle): the feature fragments are the
  * proven q_text_quality/q_text_rare_tokens spellings, the pinned sums
  * are the proven HUGEINT-promotion twin, and the elimination steps
  * are generated from the same loop order — so pred/resid are
  * bit-exact with NO output rounding.
  *
  * Scale shape: one corpus scan for features + the rare-token join
  * (vocabulary head broadcast, see rareTokenSignals), one map-side-
  * combinable aggregate to a single driver row, one literal-weight
  * expression scan to score. No shuffle beyond the rare-token join's.
  */
object QualityModel {

  /** Feature columns over (coalesced) `text` — x1 is the implicit
    * intercept; bounded to [0,1] so the 2⁻⁴⁰ pin stays exact. */
  private def featureCols(text: Column): Seq[Column] = {
    val t = coalesce(text, lit(""))
    Seq(
      lit(1.0),
      coalesce(TextFunctions.alphaRatio(t), lit(0.0)),
      coalesce(TextFunctions.stopwordRatio(t), lit(0.0)),
      least(coalesce(TextFunctions.meanTokenLen(t), lit(0.0)) / lit(20.0), lit(1.0)))
  }

  private val D = 4

  /** Fixed-order Gaussian elimination, no pivoting — the exact
    * operation sequence the oracle's generated CTE chain replays. */
  private[graft] def gaussSolve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val a = a0.map(_.clone()); val b = b0.clone()
    val n = b.length
    var k = 0
    while (k < n - 1) {
      var i = k + 1
      while (i < n) {
        val f = a(i)(k) / a(k)(k)
        var j = k
        while (j < n) { a(i)(j) = a(i)(j) - f * a(k)(j); j += 1 }
        b(i) = b(i) - f * b(k)
        i += 1
      }
      k += 1
    }
    val w = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < n) { s = s - a(i)(j) * w(j); j += 1 }
      w(i) = s / a(i)(i)
      i -= 1
    }
    w
  }

  /** @param minCount vocabulary-head threshold for the OOV target
    * @param lambda   ridge strength; keep dyadic (exact literal in any
    *                 engine)
    * @return (idCol, rare_frac, pred, resid) — rare_frac the distilled
    *         target, pred the cheap-feature prediction, resid their gap
    */
  def distill(docs: DataFrame, idCol: String, textCol: String,
              minCount: Long = 10L, lambda: Double = 1.0 / 1024): DataFrame = {
    // same internal/output-column collision guard as dedupSpans /
    // dsirWeights / LmScore.score / temperatureSample
    require(!(Set("rare_frac", "pred", "resid") ++
        (0 until D).map(i => s"__x$i")).contains(idCol),
      s"idCol '$idCol' collides with an internal or output column of distill")
    val y = PipelineOps.rareTokenSignals(docs, idCol, textCol, minCount)
      .select(col(idCol), col("rare_frac"))
    val xs = featureCols(col(textCol))
    // features + target computed once; request-scope persisted because
    // both the fit aggregate and the scoring projection read it (at
    // cluster scale Spark spills the persist — still one rare-token
    // join instead of two)
    val withF = graft.CacheScope.track(
      docs.select(col(idCol) +:
          xs.zipWithIndex.map { case (c, i) => c.as(s"__x$i") }: _*)
        .join(y, Seq(idCol)))

    // order-free exact moment sums: 10 Gram products + 4 target moments
    val aggs =
      (for (i <- 0 until D; j <- i until D;
            c <- CoreT.pinnedParts(col(s"__x$i") * col(s"__x$j"), s"__g_${i}_$j")) yield c) ++
      (for (i <- 0 until D;
            c <- CoreT.pinnedParts(col(s"__x$i") * col("rare_frac"), s"__b_$i")) yield c)
    val r = withF.agg(aggs.head, aggs.tail: _*).head()

    val a = Array.tabulate(D, D) { (i, j) =>
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      CoreT.pinnedTotal(r, s"__g_${lo}_$hi") + (if (i == j) lambda else 0.0)
    }
    val b = Array.tabulate(D)(i => CoreT.pinnedTotal(r, s"__b_$i"))
    val w = gaussSolve(a, b)

    // score: left-associated w·x, weights as plan literals
    val pred = (0 until D).map(i => lit(w(i)) * col(s"__x$i")).reduce(_ + _)
    withF.select(col(idCol), col("rare_frac"),
        pred.as("pred"))
      .withColumn("resid", col("rare_frac") - col("pred"))
  }
}
