package graft.score

import org.apache.commons.math3.distribution.{FDistribution, TDistribution}

/** Chart scoring: MST scagnostics, CDM class separation, and the
  * significance tests (port of score.py — all formulas replicated
  * exactly, including the reference's two F-statistic quirks, see
  * [[Significance.outstanding1]]).
  *
  * Driver-side by design: chart frames are bounded by the top-k caps
  * (SURVEY §7.5), so the O(n²) MST on deduped points is over at most a
  * few thousand dots regardless of table scale. The 2-D histograms
  * have a distributed twin (q_histogram2d) for when a caller wants
  * CDM over un-collected data.
  */
object Scagnostics {

  val DotNumLimit = 10 // score 0 below this (score.py:73)
  private val Eps = 1e-6

  /** numpy-style linear-interpolation percentile. */
  def percentile(sorted: Array[Double], q: Double): Double = {
    val pos = (sorted.length - 1) * q / 100.0
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  /** MST-based scatter metrics over (x,y) points. Points are deduped
    * and sorted first (score.py:81-89). */
  final class Graph(rawDots: Array[(Double, Double)]) {
    val dots: Array[(Double, Double)] = rawDots.distinct.sortBy(identity)
    val n: Int = dots.length
    val active: Boolean = n >= DotNumLimit

    private def dist(a: Int, b: Int): Double = {
      val dx = dots(a)._1 - dots(b)._1
      val dy = dots(a)._2 - dots(b)._2
      math.sqrt(dx * dx + dy * dy)
    }

    /** Prim MST: edges (a, b, length). */
    lazy val mstEdges: Array[(Int, Int, Double)] = {
      if (!active) Array.empty
      else {
        val inTree = Array.fill(n)(false)
        val minDist = Array.fill(n)(Double.MaxValue)
        val minFrom = Array.fill(n)(-1)
        inTree(0) = true
        for (j <- 1 until n) { minDist(j) = dist(0, j); minFrom(j) = 0 }
        val edges = Array.newBuilder[(Int, Int, Double)]
        for (_ <- 1 until n) {
          var best = -1
          for (j <- 0 until n if !inTree(j) && (best == -1 || minDist(j) < minDist(best)))
            best = j
          inTree(best) = true
          edges += ((minFrom(best), best, minDist(best)))
          for (j <- 0 until n if !inTree(j)) {
            val d = dist(best, j)
            if (d < minDist(j)) { minDist(j) = d; minFrom(j) = best }
          }
        }
        edges.result()
      }
    }

    private lazy val edgeLengthsSorted: Array[Double] = mstEdges.map(_._3).sorted
    private lazy val q75 = percentile(edgeLengthsSorted, 75)
    private lazy val q25 = percentile(edgeLengthsSorted, 25)
    private lazy val q90 = percentile(edgeLengthsSorted, 90)
    private lazy val q50 = percentile(edgeLengthsSorted, 50)
    private lazy val q10 = percentile(edgeLengthsSorted, 10)

    private lazy val adjacency: Array[List[(Int, Double)]] = {
      val adj = Array.fill(n)(List.empty[(Int, Double)])
      mstEdges.foreach { case (a, b, w) =>
        adj(a) = (b, w) :: adj(a); adj(b) = (a, w) :: adj(b)
      }
      adj
    }
    private def degree(v: Int): Int = adjacency(v).size

    /** tree distances from a source (BFS over the MST). */
    private def treeDistances(src: Int): Array[Double] = {
      val d = Array.fill(n)(-1.0)
      d(src) = 0.0
      var frontier = List(src)
      while (frontier.nonEmpty) {
        val next = List.newBuilder[Int]
        frontier.foreach { v =>
          adjacency(v).foreach { case (u, w) =>
            if (d(u) < 0) { d(u) = d(v) + w; next += u }
          }
        }
        frontier = next.result()
      }
      d
    }

    /** (diameter, endpointA, endpointB) via double-BFS (score.py:119-124). */
    lazy val diameter: (Double, Int, Int) = {
      val d0 = treeDistances(0)
      val a = d0.indexOf(d0.max)
      val da = treeDistances(a)
      val b = da.indexOf(da.max)
      (da(b), a, b)
    }

    private lazy val totalLength: Double = mstEdges.map(_._3).sum

    /** kept-length/total after dropping leaf edges > q75+1.5·IQR ×100
      * (score.py:141-153). */
    def outlying: Double = if (!active) 0 else {
      val w = q75 + 1.5 * (q75 - q25)
      val cut = mstEdges.collect {
        case (a, b, len) if len > w && (degree(a) == 1 || degree(b) == 1) => len
      }.sum
      100 * (totalLength - cut) / totalLength
    }

    /** (q90−q50)/(q90−q10) of edge lengths ×100 (score.py:155-158). */
    def skewed: Double = if (!active) 0
      else 100 * (q90 - q50 + Eps) / (q90 - q10 + Eps)

    /** diameter / total length ×100 (score.py:126-132). */
    def stringy: Double = if (!active) 0 else 100 * diameter._1 / totalLength

    /** euclid(ends)/diameter ×100 (score.py:134-139). */
    def straight: Double = if (!active) 0 else {
      val (dia, a, b) = diameter
      100 * dist(a, b) / dia
    }

    /** mean |cos angle| at degree-2 vertices ×100 (score.py:160-179). */
    def striated: Double = if (!active) 0 else {
      val deg2 = (0 until n).filter(degree(_) == 2)
      if (deg2.isEmpty) 0
      else {
        val s = deg2.map { v =>
          val List((a, la), (b, lb)) = adjacency(v).take(2)
          val v1x = dots(a)._1 - dots(v)._1; val v1y = dots(a)._2 - dots(v)._2
          val v2x = dots(b)._1 - dots(v)._1; val v2y = dots(b)._2 - dots(v)._2
          math.abs((v1x * v2x + v1y * v2y) / (la * lb))
        }.sum
        100 * s / deg2.size
      }
    }

    /** 100·|spearman ρ| over the deduped dots (score.py:181-186). */
    def monotonic: Double = if (!active) 0 else {
      val xr = averageRanks(dots.map(_._1))
      val yr = averageRanks(dots.map(_._2))
      100 * math.abs(pearson(xr, yr))
    }

    /** iterative biggest-edge cuts while both sides hold 5–95% of
      * points; 100·(1−lastCut/max) normalized (score.py:188-222). */
    def clumpy: Double = if (!active) 0 else {
      val sortedEdges = mstEdges.sortBy(-_._3)
      // the reference's np.min/np.max run over the DENSE adjacency
      // matrix, whose zero non-edges make the min 0 (score.py:221-222)
      // — so the normalization floor is 0, not the shortest edge
      val minEdge = 0.0
      val maxEdge = edgeLengthsSorted.last
      // REFERENCE QUIRKS, both deliberate (score.py:187-221): lastCut
      // is recorded BEFORE the component-size bounds check (tmp_cut is
      // assigned before the `.all()` test, so a failing cut's length
      // still normalizes the score), and previous cuts are RE-ADDED
      // when components are computed (tmpTreeAdjmaxCut is summed back
      // into the graph) — componentsWithout therefore skips only the
      // current edge. Do not "fix" either.
      var lastCut = -1.0
      val loBound = math.max(0.05 * n, 1.0)
      val hiBound = math.min(n - 1.0, 0.95 * n)
      var continue = true
      var i = 0
      while (continue && i < sortedEdges.length) {
        val (a, b, len) = sortedEdges(i)
        if (len > 0) {
          lastCut = len
          val comp = componentsWithout(i, sortedEdges)
          val sizes = comp.groupBy(identity).values.map(_.size)
          if (sizes.forall(s => s > loBound && s < hiBound)) i += 1
          else continue = false
        } else continue = false
      }
      if (lastCut < 0) 0
      else 100 * (1 - (Eps + lastCut - minEdge) / (Eps + maxEdge - minEdge))
    }

    private def componentsWithout(skipIdx: Int, edges: Array[(Int, Int, Double)]): Array[Int] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); parent(x) = r; r }
      edges.zipWithIndex.foreach { case ((a, b, _), idx) =>
        if (idx != skipIdx) parent(find(a)) = find(b)
      }
      Array.tabulate(n)(find)
    }
  }

  private def averageRanks(xs: Array[Double]): Array[Double] = {
    val idx = xs.zipWithIndex.sortBy(_._1)
    val ranks = new Array[Double](xs.length)
    var i = 0
    while (i < idx.length) {
      var j = i
      while (j + 1 < idx.length && idx(j + 1)._1 == idx(i)._1) j += 1
      val avg = (i + j + 2) / 2.0 // average of 1-based ranks i+1..j+1
      (i to j).foreach(k => ranks(idx(k)._2) = avg)
      i = j + 1
    }
    ranks
  }

  def pearson(a: Array[Double], b: Array[Double]): Double = {
    val n = a.length
    val ma = a.sum / n; val mb = b.sum / n
    var num = 0.0; var da = 0.0; var db = 0.0
    var i = 0
    while (i < n) {
      num += (a(i) - ma) * (b(i) - mb)
      da += (a(i) - ma) * (a(i) - ma)
      db += (b(i) - mb) * (b(i) - mb)
      i += 1
    }
    if (da == 0 || db == 0) 0.0 else num / math.sqrt(da * db)
  }

  /** 10×10 histogram with the reference's (max+1) range convention
    * (score.py:30-58); returns per-class UNNORMALIZED histograms for
    * the CDM (the normalization line is commented out in the
    * reference). Classes with negative label (outliers) are skipped. */
  def classHistograms(points: Array[(Double, Double)], labels: Array[Long]): Map[Long, Array[Array[Double]]] = {
    val minX = points.map(_._1).min; val maxX = points.map(_._1).max + 1
    val minY = points.map(_._2).min; val maxY = points.map(_._2).max + 1
    val classes = labels.distinct.filter(_ >= 0).sorted
    classes.map { cls =>
      val h = Array.fill(10, 10)(0.0)
      points.zip(labels).foreach { case ((x, y), l) =>
        if (l == cls) {
          val sx = 100 * (x - minX) / (maxX - minX)
          val sy = 100 * (y - minY) / (maxY - minY)
          h(math.min((sx / 10).toInt, 9))(math.min((sy / 10).toInt, 9)) += 1
        }
      }
      cls -> h
    }.toMap
  }

  /** Local quality: per-cluster mean of {outlying, 100−skew, stringy,
    * straight, 100−clumpy} over the groups of a categorical channel;
    * groups of ≤2 points contribute 0 (search.py:823-840). */
  def localQuality(points: Array[(Double, Double)], labels: Array[Long]): Double = {
    val groups = points.zip(labels).groupBy(_._2).toSeq.sortBy(_._1)
    if (groups.isEmpty) return 0.0
    val scores = groups.map { case (_, members) =>
      if (members.length <= 2) 0.0
      else {
        val g = new Graph(members.map(_._1))
        Seq(g.outlying, 100 - g.skewed, g.stringy, g.straight, 100 - g.clumpy).sum / 5
      }
    }
    scores.sum / scores.size
  }

  /** CDM: pairwise L1 distance of per-class histograms, ÷ n·(classes−1),
    * ×100 (score.py:61-70). */
  def cdm(points: Array[(Double, Double)], labels: Array[Long]): Double = {
    val hists = classHistograms(points, labels).toSeq.sortBy(_._1).map(_._2)
    if (hists.size < 2) return 0.0
    var total = 0.0
    for (i <- hists.indices; j <- (i + 1) until hists.size;
         r <- 0 until 10; c <- 0 until 10)
      total += math.abs(hists(i)(r)(c) - hists(j)(r)(c))
    total / points.length / (hists.size - 1) * 100
  }
}

/** Line/bar significance tests (score.py:394-452). */
object Significance {

  /** F-test of sorted values against an x^0.7 index regression
    * (score.py:394-412). Two reference quirks replicated exactly:
    * the slope denominator is Σ(data−μ)² (the DATA variance, not the
    * index variance), and the F denominator is (sse/n − 2), not
    * sse/(n−2) (score.py:411). */
  def outstanding1(raw: Array[Double]): Double = {
    val data = raw.sorted
    val n = data.length
    if (n <= 2) return 0.0
    val idx = Array.tabulate(n)(i => math.pow(i + 1, 0.7))
    val md = data.sum / n
    val mi = idx.sum / n
    var num = 0.0; var den = 0.0
    for (i <- 0 until n) {
      num += (data(i) - md) * (idx(i) - mi)
      den += (data(i) - md) * (data(i) - md)
    }
    if (den == 0) return 0.0
    val k = num / den
    val b = md - k * mi
    val pred = idx.map(i => k * i + b)
    val ssr = pred.map(p => (p - md) * (p - md)).sum
    val sse = pred.zip(data).map { case (p, d) => (p - d) * (p - d) }.sum
    val f = ssr / (sse / n - 2)
    val cdf = if (f <= 0) 0.0 else new FDistribution(1, n - 2).cumulativeProbability(f)
    100 * (1 - cdf)
  }

  /** Two-tailed Pearson t-test of a pair of series ×100
    * (score.py:415-423). */
  def correlation2(x: Array[Double], y: Array[Double]): Double = {
    val n = x.length
    if (n <= 2) return 0.0
    val r = Scagnostics.pearson(x, y)
    if (math.abs(r) >= 1.0) return 100.0
    val t = math.abs(r * math.sqrt((n - 2) / (1 - r * r)))
    100 * (1 - 2 * (1 - new TDistribution(n - 2).cumulativeProbability(t)))
  }

  /** Mean pairwise correlation across ≥2 series (score.py:425-434). */
  def correlation(series: Array[Array[Double]]): Double = {
    if (series.length < 2) return 0.0
    if (series.length == 2) return correlation2(series(0), series(1))
    val vals = for {
      i <- series.indices.dropRight(1); j <- (i + 1) until series.length
    } yield correlation2(series(i), series(j))
    vals.sum / vals.size
  }

  /** F-test against a linear 1..n index regression, same quirks
    * (score.py:436-452). */
  def linearness(data: Array[Double]): Double = {
    val n = data.length
    if (n <= 2) return 0.0
    val idx = Array.tabulate(n)(i => (i + 1).toDouble)
    val md = data.sum / n
    val mi = idx.sum / n
    var num = 0.0; var den = 0.0
    for (i <- 0 until n) {
      num += (data(i) - md) * (idx(i) - mi)
      den += (data(i) - md) * (data(i) - md)
    }
    if (den == 0) return 0.0
    val k = num / den
    val b = md - k * mi
    val pred = idx.map(i => k * i + b)
    val ssr = pred.map(p => (p - md) * (p - md)).sum
    val sse = pred.zip(data).map { case (p, d) => (p - d) * (p - d) }.sum
    val f = ssr / (sse / n - 2)
    val cdf = if (f <= 0) 0.0 else new FDistribution(1, n - 2).cumulativeProbability(f)
    100 * (1 - cdf)
  }

  /** Moment scores (score.py:454-467): population variance and
    * standardized 3rd/4th moments. */
  def dispersion(data: Array[Double]): Double = {
    val n = data.length; val m = data.sum / n
    data.map(d => (d - m) * (d - m)).sum / n
  }
  def skewScore(data: Array[Double]): Double = {
    val n = data.length; val m = data.sum / n
    val sigma = math.sqrt(dispersion(data))
    data.map(d => math.pow(d - m, 3)).sum / (n * math.pow(sigma, 3))
  }
  def heavyTailScore(data: Array[Double]): Double = {
    val n = data.length; val m = data.sum / n
    val sigma = math.sqrt(dispersion(data))
    data.map(d => math.pow(d - m, 4)).sum / (n * math.pow(sigma, 4))
  }
}
