package graft

import org.apache.spark.sql.functions._
import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val STEPS = Seq("view", "click", "buy")
  private val W = 100L

  private def run(rows: Seq[(Long, Long, String)]): Map[Long, (Long, Long, Long)] =
    Funnel.funnel(rows.toDF("user_id", "ts_us", "event_type"),
        "user_id", "ts_us", "event_type", STEPS, W)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("depths, windows, and the strictly-after rule") {
    val r = run(Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),   // full
      (2L, 10L, "view"), (2L, 200L, "click"),                    // click outside W
      (3L, 10L, "view"), (3L, 20L, "click"), (3L, 121L, "buy"),  // buy outside W of click
      (4L, 10L, "click"), (4L, 20L, "buy"),                      // no anchor → no row
      (5L, 10L, "view"), (5L, 10L, "click"),                     // same-ts: not strictly after
      (6L, 10L, "buy"), (6L, 20L, "view"), (6L, 30L, "click"), (6L, 40L, "buy")
    ))
    assert(r(1L) == ((3L, 10L, 30L)))
    assert(r(2L) == ((1L, 10L, 10L)))
    assert(r(3L) == ((2L, 10L, 20L)))
    assert(!r.contains(4L))
    assert(r(5L) == ((1L, 10L, 10L)))
    assert(r(6L) == ((3L, 20L, 40L)), "pre-anchor events are ignored")
  }

  test("greedy-first anchoring is the pinned convention (documented undercount)") {
    // anchoring at the SECOND view (ts 150) would complete the funnel;
    // greedy-first anchors at ts 10, whose click window is missed
    val r = run(Seq(
      (1L, 10L, "view"), (1L, 150L, "view"),
      (1L, 160L, "click"), (1L, 170L, "buy")))
    assert(r(1L) == ((1L, 10L, 10L)))
  }

  test("matches a driver-side fold on a generated 200-user event log") {
    // deterministic pseudo-random log: type and timestamp derive from
    // (user, i) arithmetic — ties and window violations both occur
    val types = Vector("view", "click", "buy", "noise")
    val rows = for (u <- 0L until 200L; i <- 0 until 40) yield {
      val t = ((u * 7 + i * 13) % 29) * 17 + i * 11
      (u, t, types(((u + i * 3) % 41 % 4).toInt))
    }
    val expected = rows.groupBy(_._1).flatMap { case (u, evs) =>
      var depth = 0; var tFirst = 0L; var tLast = 0L
      evs.sortBy(_._2).foreach { case (_, t, y) =>
        if (depth == 0) { if (y == STEPS.head) { depth = 1; tFirst = t; tLast = t } }
        else if (depth < STEPS.size && y == STEPS(depth) &&
                 t > tLast && t - tLast <= W) { depth += 1; tLast = t }
      }
      if (depth > 0) Some(u -> ((depth.toLong, tFirst, tLast))) else None
    }
    assert(run(rows) == expected)
  }

  test("plan shape: one user-key exchange, no Window") {
    val df = Seq((1L, 10L, "view")).toDF("user_id", "ts_us", "event_type")
    val plan = Funnel.funnel(df, "user_id", "ts_us", "event_type", STEPS, W)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window operator expected:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1, s"one shuffle expected:\n$plan")
  }
}
