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

  private def tv(a: Seq[String], b: Seq[String]): (Double, Long, Long, Long) =
    Drift.tvDistance(a.toDF("c"), b.toDF("c"), "c")
      .as[(Double, Long, Long, Long)].head()

  test("hand-computed TV distance; identical mixes give 0, disjoint give 1") {
    // A = {x,x,y,z}, B = {x,y,y,y}: |2/4-1/4| + |1/4-3/4| + |1/4-0| = 1
    // -> TV = 0.5
    val (d, na, nb, nc) = tv(Seq("x", "x", "y", "z"), Seq("x", "y", "y", "y"))
    assert(d == 0.5 && na == 4L && nb == 4L && nc == 3L)
    assert(tv(Seq("a", "b"), Seq("a", "b"))._1 == 0.0)
    assert(tv(Seq("a", "a"), Seq("b"))._1 == 1.0)
  }

  test("TV: null is a category; unequal sizes use exact cross-products") {
    // A = {a, null}, B = {a, a, a, null}: |1/2-3/4| + |1/2-1/4| = 1/2
    val a = Seq(Some("a"), None)
    val b = Seq(Some("a"), Some("a"), Some("a"), None)
    val (d, na, nb, nc) = Drift.tvDistance(a.toDF("c"), b.toDF("c"), "c")
      .as[(Double, Long, Long, Long)].head()
    assert(d == 0.25 && na == 2L && nb == 4L && nc == 2L)
  }

  test("TV: matches a driver-side fold on generated categorical mixes") {
    val a = (0 until 900).map(i => s"c${(i * i) % 13}")
    val b = (0 until 400).map(i => s"c${(i * 7) % 17}")
    val cats = (a ++ b).distinct
    val expected = cats.map { c =>
      math.abs(a.count(_ == c).toDouble / a.size - b.count(_ == c).toDouble / b.size)
    }.sum / 2.0
    val (d, na, nb, nc) = tv(a, b)
    assert(na == 900L && nb == 400L && nc == cats.size.toLong)
    assert(math.abs(d - expected) < 1e-12, s"got $d, expected $expected")
  }

  test("TV: an empty side raises loudly instead of dividing by zero") {
    val e = intercept[Exception] {
      Drift.tvDistance(Seq("a").toDF("c"),
        Seq.empty[String].toDF("c"), "c").collect()
    }
    assert(causeMessages(e).exists(_.contains("side is empty")), causeMessages(e).mkString("|"))
  }

  test("windowedTvDrift: hand-computed per-window TV incl. the missing-mass term") {
    // reference: a:3, b:1 (nb=4). Window 0 events: a,a (na=2) ->
    // terms |2*4-3*2| + missing b: (4-3)*2 -> (2+2)/(2*2*4) = 0.25
    // Window 100 events: b,c (na=2): |b: 1*4-1*2| + |c: 1*4-0| +
    // missing a: (4-1-... wait c not in ref: cb0=0; present cb sum = 1 (b)
    // -> missing = (4-1)*2 = 6; terms |1*4-1*2|=2, |1*4-0*2|=4 -> (2+4+6)/(2*2*4)=0.75
    val events = Seq((5L, "a"), (50L, "a"), (150L, "b"), (199L, "c"))
      .toDF("ts", "cat")
    val ref = Seq(("a", 3L), ("b", 1L)).toDF("category", "n")
    val out = Drift.windowedTvDrift(events, "ts", "cat", 100L, ref)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(0L -> ((2L, 0.25)), 100L -> ((2L, 0.75))))
  }

  test("windowedTvDrift: a window matching the reference mix exactly scores 0; duplicate ref rows collapse") {
    val events = Seq((0L, "a"), (1L, "a"), (2L, "a"), (3L, "b")).toDF("ts", "cat")
    val ref = Seq(("a", 2L), ("a", 1L), ("b", 1L)).toDF("category", "n") // a:3 after collapse
    val out = Drift.windowedTvDrift(events, "ts", "cat", 1000L, ref)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((0L, 4L, 0.0)))
  }

  test("windowedTvDrift: null event times form no window") {
    val events = Seq((Some(0L), "a"), (None, "a"), (Some(1L), "b"))
      .map { case (t, c) => (t.map(java.lang.Long.valueOf).orNull, c) }
      .toDF("ts", "cat")
    val ref = Seq(("a", 1L), ("b", 1L)).toDF("category", "n")
    val out = Drift.windowedTvDrift(events, "ts", "cat", 1000L, ref)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((0L, 2L, 0.0)),
      "the null-ts row must not pool into a null-keyed window")
  }

  test("TV: BOTH sides empty still raises (the totals spine survives zero categories)") {
    val e = intercept[Exception] {
      Drift.tvDistance(Seq.empty[String].toDF("c"),
        Seq.empty[String].toDF("c"), "c").collect()
    }
    assert(causeMessages(e).exists(_.contains("side is empty")), causeMessages(e).mkString("|"))
  }

  test("windowedTvDrift: NULL is a category — null-safe reference match (no double term)") {
    // window events: a, NULL (na=2); reference: a:1, NULL:1 (nb=2).
    // Mix matches exactly -> TV 0. An equality join would leave the
    // NULL row unmatched: terms |2·1 - 0| + missing (2-1)·2 = 4 -> 0.5.
    val events = Seq((0L, Some("a")), (1L, None))
      .map { case (t, c) => (t, c.orNull) }.toDF("ts", "cat")
    val ref = Seq((Some("a"), 1L), (None, 1L))
      .map { case (c, n) => (c.orNull, n) }.toDF("category", "n")
    val out = Drift.windowedTvDrift(events, "ts", "cat", 1000L, ref)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((0L, 2L, 0.0)),
      "NULL category must match the reference's NULL row, not double-count")
  }

  test("windowedTvDrift: negative (pre-1970) timestamps bucket with FLOOR semantics") {
    // ts=-1 with width 100 must land in window [-100, 0), i.e.
    // window_start = -100 — truncate-toward-zero `div` would put it in
    // window 0 alongside ts=5, breaking oracle/stream-twin alignment
    val events = Seq((-1L, "a"), (5L, "a")).toDF("ts", "cat")
    val ref = Seq(("a", 1L)).toDF("category", "n")
    val out = Drift.windowedTvDrift(events, "ts", "cat", 100L, ref)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((-100L, 1L, 0.0), (0L, 1L, 0.0)))
  }

  test("windowedTvDrift: empty reference raises loudly") {
    val events = Seq((0L, "a")).toDF("ts", "cat")
    val ref = Seq.empty[(String, Long)].toDF("category", "n")
    val e = intercept[Exception] {
      Drift.windowedTvDrift(events, "ts", "cat", 100L, ref).collect()
    }
    assert(causeMessages(e).exists(_.contains("reference distribution is empty")),
      causeMessages(e).mkString("|"))
  }
}
