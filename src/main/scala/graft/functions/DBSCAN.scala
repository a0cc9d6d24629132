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
        // enqueue each point at most once: label BEFORE enqueueing, so
        // a dense cluster can't flood the queue with duplicates (the
        // naive enqueueAll(neighbors) is O(n·k) queue growth)
        val queue = mutable.Queue[Int]()
        ni.foreach { u =>
          if (labels(u) == -1) labels(u) = cluster // noise → border
          else if (labels(u) == -2) { labels(u) = cluster; queue.enqueue(u) }
        }
        while (queue.nonEmpty) {
          val j = queue.dequeue()
          val nj = neighbors(j)
          if (nj.size >= minPts) {
            nj.foreach { u =>
              if (labels(u) == -1) labels(u) = cluster
              else if (labels(u) == -2) { labels(u) = cluster; queue.enqueue(u) }
            }
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

    // the grid index enumerates 3^dim neighbor cells — past ~8 dims
    // that explodes; fall back to direct distance scans
    if (dim > 8) {
      def d(i: Int, j: Int): Double = {
        var s = 0.0; var k = 0
        while (k < dim) { val diff = points(i)(k) - points(j)(k); s += diff * diff; k += 1 }
        math.sqrt(s)
      }
      return fit(n, d, eps, minPts)
    }

    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var k = 0
      while (k < dim) { val diff = a(k) - b(k); s += diff * diff; k += 1 }
      s
    }

    // eps-cell index; cells precomputed once per point
    val cells: Array[Seq[Int]] =
      points.map(p => p.map(x => math.floor(x / eps).toInt).toSeq)
    val grid = mutable.HashMap[Seq[Int], mutable.ArrayBuffer[Int]]()
    points.indices.foreach { i =>
      grid.getOrElseUpdate(cells(i), mutable.ArrayBuffer[Int]()) += i
    }
    val offsets: IndexedSeq[IndexedSeq[Int]] =
      (0 until dim).foldLeft(IndexedSeq(IndexedSeq.empty[Int]))((acc, _) =>
        acc.flatMap(pfx => IndexedSeq(-1, 0, 1).map(pfx :+ _)))
    val eps2 = eps * eps

    val labels = Array.fill(n)(-2)
    var cluster = -1
    def neighbors(i: Int): IndexedSeq[Int] = {
      val c = cells(i)
      val pi = points(i)
      val out = IndexedSeq.newBuilder[Int]
      offsets.foreach { off =>
        val key = Seq.tabulate(dim)(k => c(k) + off(k))
        grid.get(key).foreach { bucket =>
          bucket.foreach { j => if (sqDist(pi, points(j)) <= eps2) out += j }
        }
      }
      out.result()
    }
    for (i <- 0 until n if labels(i) == -2) {
      val ni = neighbors(i)
      if (ni.size < minPts) labels(i) = -1
      else {
        cluster += 1
        labels(i) = cluster
        val queue = mutable.Queue[Int]()
        ni.foreach { u =>
          if (labels(u) == -1) labels(u) = cluster
          else if (labels(u) == -2) { labels(u) = cluster; queue.enqueue(u) }
        }
        while (queue.nonEmpty) {
          val j = queue.dequeue()
          val nj = neighbors(j)
          if (nj.size >= minPts) {
            nj.foreach { u =>
              if (labels(u) == -1) labels(u) = cluster
              else if (labels(u) == -2) { labels(u) = cluster; queue.enqueue(u) }
            }
          }
        }
      }
    }
    labels
  }
}
