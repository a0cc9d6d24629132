package graft

import graft.operators.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def ks(a: Seq[Double], b: Seq[Double]): (Double, Double, Long, Long) =
    Drift.ksTwoSample(a.toDF("x"), b.toDF("x"), "x")
      .as[(Double, Double, Long, Long)].head()

  test("hand-computed supremum gap, inclusive CDF, tie to smallest value") {
    // A = {1,2,3,4}, B = {3,4,5,6}: gap at v=2 is |2/4 - 0/4| = 0.5,
    // also 0.5 at v=1? |1/4-0|=0.25. Max 0.5 first attained at v=2.
    val (d, at, n, m) = ks(Seq(1, 2, 3, 4), Seq(3, 4, 5, 6))
    assert(d == 0.5 && at == 2.0 && n == 4L && m == 4L)
  }

  test("identical samples give 0; disjoint samples give 1") {
    assert(ks(Seq(1, 2, 3), Seq(1, 2, 3))._1 == 0.0)
    val (d, at, _, _) = ks(Seq(1, 2), Seq(10, 20))
    assert(d == 1.0 && at == 2.0)
  }

  test("matches a driver-side exact KS on generated unequal samples") {
    val a = (0 until 700).map(i => ((i * 37) % 211).toDouble / 7.0)
    val b = (0 until 300).map(i => ((i * 53) % 211).toDouble / 6.0)
    val values = (a ++ b).distinct.sorted
    val expected = values.map { v =>
      val ca = a.count(_ <= v).toDouble / a.size
      val cb = b.count(_ <= v).toDouble / b.size
      (math.abs(ca - cb), v)
    }.sortBy { case (g, v) => (-g, v) }.head
    val (d, at, n, m) = ks(a, b)
    assert(n == 700L && m == 300L)
    assert(d == expected._1 && at == expected._2,
      s"got ($d, $at), expected $expected")
  }

  test("plan shape: no global window (the cumulative is the prefix-sum RDD pass)") {
    val plan = Drift.ksTwoSample(Seq(1.0).toDF("x"), Seq(2.0).toDF("x"), "x")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window operator expected:\n$plan")
  }
}
