package graft

import graft.operators.Anomaly

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, Double)], n: Int = 4,
                  thresh: Double = 3.0): Map[Long, (Double, Long)] =
    Anomaly.rollingZScores(rows.toDF("k", "ts", "id", "x"),
        "k", "ts", "id", "x", windowN = n, thresh = thresh)
      .select("id", "zq", "is_anomaly").as[(Long, Double, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("hand-computed z over a 4-event window; warm-up rows emit nothing") {
    // key a: values 1,1,1,5 — the spike's window has mean 2, var 3
    val rows = Seq(("a", 1L, 1L, 1.0), ("a", 2L, 2L, 1.0),
      ("a", 3L, 3L, 1.0), ("a", 4L, 4L, 5.0), ("a", 5L, 5L, 1.0))
    val r = run(rows)
    assert(!r.contains(1L) && !r.contains(2L) && !r.contains(3L),
      "fewer than windowN predecessors -> no score")
    // quantized exactly (integers): z = (5-2)/sqrt(3) at id 4
    assert(math.abs(r(4L)._1 - 3.0 / math.sqrt(3.0)) < 1e-12)
    assert(r(4L)._2 == 0L, "z ~ 1.73 is not an anomaly at 3.0")
    assert(run(rows, thresh = 1.5)(4L)._2 == 1L)
  }

  test("zero-variance window scores 0, not NaN; keys are independent") {
    val rows = Seq(("a", 1L, 1L, 2.0), ("a", 2L, 2L, 2.0),
      ("a", 3L, 3L, 2.0), ("a", 4L, 4L, 2.0),
      ("b", 1L, 10L, 9.0), ("b", 2L, 11L, 1.0),
      ("b", 3L, 12L, 9.0), ("b", 4L, 13L, 1.0))
    val r = run(rows)
    assert(r(4L) == ((0.0, 0L)))
    assert(r.contains(13L) && !r(13L)._1.isNaN)
  }

  test("matches a driver-side fold on a generated stream") {
    val rows = for (k <- Seq("x", "y"); i <- 0 until 200) yield
      (k, i.toLong, (if (k == "x") 1000L else 2000L) + i,
        ((i * 37 + k.hashCode.abs) % 97) / 3.0)
    val n = 24
    val expected = rows.groupBy(_._1).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val vs = sorted.map(e => math.floor(e._4 * 1024.0).toLong)
      sorted.indices.filter(_ >= n - 1).map { i =>
        val win = vs.slice(i - n + 1, i + 1)
        val s = win.sum.toDouble; val q = win.map(v => v * v).sum.toDouble
        val varNum = q - (s * s) / n
        val z = if (varNum <= 0.0) 0.0
                else (vs(i).toDouble - s / n) / math.sqrt(varNum / n)
        sorted(i)._3 -> ((z, if (math.abs(z) > 3.0) 1L else 0L))
      }
    }
    assert(run(rows, n) == expected)
  }

  test("null values neither score nor occupy a window slot") {
    // a null in the middle of the stream: without the pre-window
    // filter it would count toward __n while contributing nothing to
    // the moment sums (the round-12 verdict finding)
    val withNull = Seq(
      ("a", 1L, 1L, java.lang.Double.valueOf(1.0)),
      ("a", 2L, 2L, java.lang.Double.valueOf(1.0)),
      ("a", 3L, 3L, null.asInstanceOf[java.lang.Double]),
      ("a", 4L, 4L, java.lang.Double.valueOf(1.0)),
      ("a", 5L, 5L, java.lang.Double.valueOf(5.0)))
    val r = Anomaly.rollingZScores(withNull.toDF("k", "ts", "id", "x"),
        "k", "ts", "id", "x", windowN = 4)
      .select("id", "zq", "is_anomaly").as[(Long, Double, Long)]
      .collect().map(x => x._1 -> ((x._2, x._3))).toMap
    // the null row itself emits nothing, and the window that spans it
    // behaves as if it never existed: ids 1,2,4,5 form the 4-window
    assert(!r.contains(3L), "the null row must not score")
    assert(r.keySet == Set(5L), "warm-up completes only at the 4th non-null row")
    assert(math.abs(r(5L)._1 - 3.0 / math.sqrt(3.0)) < 1e-12,
      "z must equal the null-free fold (mean 2, var 3 at the spike)")
  }

  test("the exactness bound raises loudly instead of drifting") {
    val rows = Seq(("a", 1L, 1L, 1.0e9), ("a", 2L, 2L, 1.0e9))
    val e = intercept[Exception] {
      Anomaly.rollingZScores(rows.toDF("k", "ts", "id", "x"),
        "k", "ts", "id", "x", windowN = 2).collect()
    }
    assert(causeMessages(e).exists(_.contains("exactness bound")), causeMessages(e).mkString("|"))
  }
}
