package graft.functions

import scala.collection.mutable

/** Driver-side DBSCAN over a precomputed distance function.
  *
  * The reference runs sklearn DBSCAN twice over *columns-as-points*
  * (dimension-match clustering on the Wasserstein matrix,
  * spreadsheet.py:197-213, and semantic clustering on name embeddings,
  * spreadsheet.py:239-253) and once over *rows* as a core transform
  * (Tfunctions.py:90-94). Column counts are tiny regardless of data
  * scale, so the column uses stay on the driver by design; the row use
  * goes through [[graft.operators.CoreT]] which bounds its input.
  *
  * Classic algorithm: a point with ≥ minPts neighbors within eps is a
  * core point; clusters are the connected components of core points
  * plus their border points; everything else is noise (label -1).
  * Matches sklearn's definition (border points join the first core
  * cluster that reaches them).
  */
object DBSCAN {

  /** @return cluster label per point, -1 for noise; labels are 0-based
    *         in discovery order (same convention as sklearn). */
  def fit(n: Int, dist: (Int, Int) => Double, eps: Double, minPts: Int): Array[Int] = {
    val labels = Array.fill(n)(-2) // -2 = unvisited, -1 = noise
    var cluster = -1
    def neighbors(i: Int): IndexedSeq[Int] =
      (0 until n).filter(j => dist(i, j) <= eps)
    for (i <- 0 until n if labels(i) == -2) {
      val ni = neighbors(i)
      if (ni.size < minPts) labels(i) = -1
      else {
        cluster += 1
        labels(i) = cluster
        val queue = mutable.Queue[Int](ni: _*)
        while (queue.nonEmpty) {
          val j = queue.dequeue()
          if (labels(j) == -1) labels(j) = cluster // noise → border
          if (labels(j) == -2) {
            labels(j) = cluster
            val nj = neighbors(j)
            if (nj.size >= minPts) queue.enqueueAll(nj)
          }
        }
      }
    }
    labels
  }

  /** Euclidean DBSCAN over dense points, with an eps-grid spatial index
    * so neighbor lookups scan only adjacent cells instead of all n
    * points (O(n·k) instead of O(n²) for clustered data — needed once
    * the core-transform path runs on real table sizes rather than the
    * reference's 400-row cap). */
  def fitPoints(points: Array[Array[Double]], eps: Double, minPts: Int): Array[Int] = {
    val n = points.length
    if (n == 0) return Array.empty
    val dim = points(0).length

    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var k = 0
      while (k < dim) { val diff = a(k) - b(k); s += diff * diff; k += 1 }
      s
    }

    // eps-cell index
    def cellOf(p: Array[Double]): Seq[Int] = p.map(x => math.floor(x / eps).toInt).toSeq
    val grid = mutable.HashMap[Seq[Int], mutable.ArrayBuffer[Int]]()
    points.indices.foreach { i =>
      grid.getOrElseUpdate(cellOf(points(i)), mutable.ArrayBuffer[Int]()) += i
    }
    val offsets: Seq[Seq[Int]] =
      (0 until dim).foldLeft(Seq(Seq.empty[Int]))((acc, _) =>
        acc.flatMap(pfx => Seq(-1, 0, 1).map(pfx :+ _)))
    val eps2 = eps * eps

    val labels = Array.fill(n)(-2)
    var cluster = -1
    def neighbors(i: Int): IndexedSeq[Int] = {
      val c = cellOf(points(i))
      offsets.flatMap { off =>
        grid.get(c.zip(off).map { case (a, b) => a + b })
          .map(_.filter(j => sqDist(points(i), points(j)) <= eps2))
          .getOrElse(Nil)
      }.toIndexedSeq
    }
    for (i <- 0 until n if labels(i) == -2) {
      val ni = neighbors(i)
      if (ni.size < minPts) labels(i) = -1
      else {
        cluster += 1
        labels(i) = cluster
        val queue = mutable.Queue[Int](ni: _*)
        while (queue.nonEmpty) {
          val j = queue.dequeue()
          if (labels(j) == -1) labels(j) = cluster
          if (labels(j) == -2) {
            labels(j) = cluster
            val nj = neighbors(j)
            if (nj.size >= minPts) queue.enqueueAll(nj)
          }
        }
      }
    }
    labels
  }
}
