package graft

import graft.operators.GraphComponents

class GraphComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphComponents.connectedComponents(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap

  test("chains, pairs, and direction-independence") {
    val r = run(Seq((1L, 2L), (3L, 2L), (10L, 11L), (21L, 20L)))
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("matches a driver-side BFS labeling on a generated graph") {
    // deterministic graph: rings of varying size plus chords
    val edges = (0 until 400).map { i =>
      val ring = i % 7
      (ring * 1000L + i / 7, ring * 1000L + (i / 7 + 1) % 60)
    } ++ Seq((0L, 1000L), (2000L, 3000L)) // two chords merge four rings
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    def bfs(start: Long): Set[Long] = {
      var seen = Set(start); var frontier = Set(start)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
        seen ++= frontier
      }
      seen
    }
    val nodes = adj.keySet
    val expected = scala.collection.mutable.HashMap.empty[Long, Long]
    var rest = nodes
    while (rest.nonEmpty) {
      val comp = bfs(rest.head)
      val m = comp.min
      comp.foreach(n => expected(n) = m)
      rest --= comp
    }
    assert(run(edges) == expected.toMap)
  }
}
