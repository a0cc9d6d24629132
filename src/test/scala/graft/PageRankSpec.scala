package graft

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .select("node", "pagerank_micro").as[(Long, Long)].collect().toMap

  /** Driver-side replica of the fixed-point iteration — the operator
    * must match it to the micro-unit. */
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size
    val outd = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val tele = ((PageRank.SCALE / n) * 15L) / 100L
    var r = nodes.map(_ -> PageRank.SCALE / n).toMap
    for (_ <- 0 until iters) {
      val dang = nodes.filterNot(outd.contains).map(r).sum
      val insum = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / outd(s) }.sum }
      r = nodes.map(nd =>
        nd -> (tele + 85L * (insum.getOrElse(nd, 0L) + dang / n) / 100L)).toMap
    }
    r
  }

  test("matches the driver-side fixed-point replica to the micro-unit") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L), (4L, 5L))
    for (it <- Seq(0, 1, 3, 5))
      assert(run(edges, it) == ref(edges, it), s"iters=$it")
  }

  test("dangling mass recirculates; in-link count drives rank order") {
    // 5 spokes all point at the hub; the hub points nowhere (dangling)
    val edges = (1L to 5L).map(s => (s, 100L))
    val r = run(edges, 3)
    assert(r(100L) > r(1L), "the hub must outrank every spoke")
    assert((1L to 5L).map(r).distinct.size == 1, "symmetric spokes tie exactly")
    val total = r.values.sum
    assert(total <= PageRank.SCALE &&
      total > PageRank.SCALE - 1000L * r.size,
      s"floor bias only loses micro-units, total=$total")
  }

  test("bit-identical micro ranks across partitionings (the fixed-point contract)") {
    val edges = (0 until 400).map(i => ((i % 37).toLong, ((i * 13 + 5) % 41 + 100).toLong))
    val base = run(edges, 3)
    val shuffled = PageRank.pageRank(
        edges.toDF("src", "dst").repartition(13), "src", "dst", 3)
      .select("node", "pagerank_micro").as[(Long, Long)].collect().toMap
    assert(base == shuffled)
  }

  test("duplicate edges collapse; iters=0 returns the uniform init") {
    val r = run(Seq((1L, 2L), (1L, 2L), (2L, 3L)), 0)
    assert(r.values.toSet == Set(PageRank.SCALE / 3))
  }
}
