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

  /** Euclidean DBSCAN over dense points. */
  def fitPoints(points: Array[Array[Double]], eps: Double, minPts: Int): Array[Int] = {
    def d(i: Int, j: Int): Double = {
      var s = 0.0
      val a = points(i); val b = points(j)
      var k = 0
      while (k < a.length) { val diff = a(k) - b(k); s += diff * diff; k += 1 }
      math.sqrt(s)
    }
    fit(points.length, d, eps, minPts)
  }
}
