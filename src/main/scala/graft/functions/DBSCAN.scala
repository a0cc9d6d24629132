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
  def fit(n: Int, dist: (Int, Int) => Double, eps: Double, minPts: Int): Array[Int] =
    expand(n, i => (0 until n).filter(j => dist(i, j) <= eps), minPts)

  /** The one cluster-expansion BFS behind [[fit]] and [[fitPoints]] —
    * they differ only in how `neighbors` is produced (distance-function
    * scan vs eps-grid index). The label-before-enqueue invariant lives
    * in exactly one place. */
  private def expand(n: Int, neighbors: Int => IndexedSeq[Int], minPts: Int): Array[Int] = {
    val labels = Array.fill(n)(-2) // -2 = unvisited, -1 = noise
    var cluster = -1
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

  /** Neighbor-lookup function over dense points: an eps-grid spatial
    * index for ≤8 dims (adjacent-cell scans, O(n·k) total), direct
    * distance scans past that (the 3^dim cell enumeration explodes). */
  private def neighborFn(points: Array[Array[Double]], eps: Double): Int => IndexedSeq[Int] = {
    val n = points.length
    val dim = points(0).length
    val eps2 = eps * eps
    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var k = 0
      while (k < dim) { val diff = a(k) - b(k); s += diff * diff; k += 1 }
      s
    }
    if (dim > 8) {
      (i: Int) => (0 until n).filter(j => sqDist(points(i), points(j)) <= eps2)
    } else {
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
      (i: Int) => {
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
    }
  }

  /** Euclidean DBSCAN over dense points (discovery-order labels, same
    * convention as [[fit]]/sklearn). */
  def fitPoints(points: Array[Array[Double]], eps: Double, minPts: Int): Array[Int] = {
    if (points.isEmpty) return Array.empty
    expand(points.length, neighborFn(points, eps), minPts)
  }

  /** Order-independent DBSCAN labeling: a cluster is labeled by the
    * MINIMUM key among its core points, a border point takes the
    * minimum such label over its core neighbors, noise is -1.
    *
    * Identical cluster MEMBERSHIP to [[fitPoints]] for core points;
    * border points within eps of two clusters go to the min-labeled one
    * (visit-order in fitPoints/sklearn) — a deterministic tie-break
    * instead of an incidental one, which is what makes the labeling
    * reproducible by a SQL engine (the q_coret_dbscan DuckDB oracle is
    * an ε-graph recursive CTE over exactly these semantics). */
  def canonicalPoints(points: Array[Array[Double]], eps: Double, minPts: Int,
                      keys: Array[Long]): Array[Long] = {
    val n = points.length
    if (n == 0) return Array.empty
    require(keys.length == n, "one key per point")
    val neighbors = neighborFn(points, eps)

    val nbrs = Array.tabulate(n)(neighbors) // each point's list, once
    val isCore = nbrs.map(_.size >= minPts)

    // union-find over core-core eps edges
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val next = parent(c); parent(c) = r; c = next }
      r
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for (i <- 0 until n if isCore(i); j <- nbrs(i) if isCore(j)) union(i, j)

    val minKey = mutable.HashMap[Int, Long]()
    for (i <- 0 until n if isCore(i)) {
      val r = find(i)
      minKey(r) = math.min(minKey.getOrElse(r, Long.MaxValue), keys(i))
    }
    Array.tabulate(n) { i =>
      if (isCore(i)) minKey(find(i))
      else {
        val coreNbrs = nbrs(i).filter(isCore)
        if (coreNbrs.isEmpty) -1L else coreNbrs.map(j => minKey(find(j))).min
      }
    }
  }
}
