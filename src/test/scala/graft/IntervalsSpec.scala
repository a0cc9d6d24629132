package graft

import graft.operators.Intervals

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)], adjacency: Long = 0L)
      : Set[(Long, Long, Long, Long)] =
    Intervals.mergeIntervals(rows.toDF("k", "s", "e"), "k", "s", "e", adjacency)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("overlap, touch, containment, and per-key isolation") {
    val r = run(Seq(
      (1L, 0L, 10L), (1L, 5L, 20L),   // overlap -> [0,20]
      (1L, 20L, 30L),                 // touches -> joins (adjacency 0)
      (1L, 40L, 50L), (1L, 42L, 44L), // containment -> [40,50]
      (2L, 0L, 5L)))                  // other key untouched
    assert(r == Set((1L, 0L, 30L, 3L), (1L, 40L, 50L, 2L), (2L, 0L, 5L, 1L)))
  }

  test("adjacency widens merges; -1 keeps touching intervals apart") {
    val rows = Seq((1L, 0L, 10L), (1L, 12L, 20L), (1L, 20L, 25L))
    assert(run(rows).size == 2, "gap of 2 stays split at adjacency 0")
    assert(run(rows, adjacency = 2L).size == 1, "gap of 2 merges at adjacency 2")
    assert(run(rows, adjacency = -1L).size == 3, "touching stays split at -1")
  }

  test("matches a driver-side sweep on generated spans") {
    val rows = for (k <- 0L until 20L; i <- 0 until 50) yield {
      val s = ((k * 13 + i * 29) % 397) * 5
      (k, s, s + 3 + (i % 11))
    }
    val expected = rows.groupBy(_._1).flatMap { case (k, ivs) =>
      val sorted = ivs.map(v => (v._2, v._3)).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var (cs, ce, cn) = (sorted.head._1, sorted.head._2, 1L)
      sorted.tail.foreach { case (s, e) =>
        if (s <= ce) { ce = math.max(ce, e); cn += 1 }
        else { out += ((k, cs, ce, cn)); cs = s; ce = e; cn = 1 }
      }
      out += ((k, cs, ce, cn))
      out
    }.toSet
    assert(run(rows) == expected)
  }

  test("plan shape: every window is key-partitioned (no global funnel)") {
    val plan = Intervals.mergeIntervals(
        Seq((1L, 0L, 1L)).toDF("k", "s", "e"), "k", "s", "e")
      .queryExecution.executedPlan.toString
    // a bare Window.orderBy would show an all-rows single partition;
    // both windows here carry the key in their partition spec
    assert(!plan.contains("Window [")
      || !plan.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      s"windows must be key-partitioned:\n$plan")
  }
}
