package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def agg(rows: Seq[(String, Long)]) =
    rows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n_rows"), sum("v").as("total"))

  private def maintain(base: Seq[(String, Long)], chg: Seq[(String, Long, String)]) =
    IncrementalAgg.maintainSumCount(agg(base),
        chg.toDF("k", "v", "op"), Seq("k"), "v", "op")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("insert, delete, update (D+I), born group, dead group") {
    val base = Seq(("a", 10L), ("a", 20L), ("b", 5L), ("c", 7L))
    val chg = Seq(
      ("a", 30L, "I"),                    // plain insert
      ("b", 5L, "D"), ("b", 8L, "I"),     // update decomposed as D+I
      ("c", 7L, "D"),                     // group dies
      ("d", 99L, "I"))                    // group born
    val r = maintain(base, chg)
    assert(r("a") == ((3L, 60L)))
    assert(r("b") == ((1L, 8L)))
    assert(!r.contains("c"), "fully-deleted group must vanish")
    assert(r("d") == ((1L, 99L)))
    assert(r.size == 3)
  }

  test("empty changelog is the identity; unknown ops contribute nothing") {
    val base = Seq(("a", 1L), ("b", 2L))
    assert(maintain(base, Nil) == Map("a" -> ((1L, 1L)), "b" -> ((1L, 2L))))
    assert(maintain(base, Seq(("a", 100L, "X"))) ==
      Map("a" -> ((1L, 1L)), "b" -> ((1L, 2L))))
  }

  test("maintenance equals recompute on a generated base + changelog") {
    val base = (0 until 500).map(i => (s"k${i % 23}", (i * 37 % 101).toLong))
    // deterministic changelog: delete every 5th base row, insert a
    // tweaked copy of every 7th, plus rows for two brand-new keys
    val dels = base.zipWithIndex.collect { case ((k, v), i) if i % 5 == 0 => (k, v, "D") }
    val ins = base.zipWithIndex.collect { case ((k, v), i) if i % 7 == 0 => (k, v + 1000L, "I") }
    val born = Seq(("new1", 11L, "I"), ("new2", 22L, "I"))
    val maintained = maintain(base, dels ++ ins ++ born)
    // recompute from the logically-updated multiset
    val kept = base.zipWithIndex.collect { case ((k, v), i) if i % 5 != 0 => (k, v) }
    val added = ins.map(c => (c._1, c._2)) ++ born.map(c => (c._1, c._2))
    val expected = (kept ++ added).groupBy(_._1)
      .map { case (k, vs) => k -> ((vs.size.toLong, vs.map(_._2).sum)) }
    assert(maintained == expected)
  }

  test("over-deletion raises loudly instead of vanishing like a dead group") {
    // a 'D' with no matching prior insert drives the count to -1: a
    // corrupt changelog must not look identical to a legitimately-
    // vanished group (the round-12 verdict finding)
    val e = intercept[Exception] {
      maintain(Seq(("a", 10L)), Seq(("a", 10L, "D"), ("a", 10L, "D")))
    }
    assert(causeMessages(e).exists(_.contains("corrupt changelog")), causeMessages(e).mkString("|"))
    // exact zero remains a legitimate group death, not an error
    assert(maintain(Seq(("a", 10L)), Seq(("a", 10L, "D"))) == Map.empty)
  }

  test("plan shape: the wide agg runs over the changelog only") {
    val base = agg(Seq(("a", 1L)))
    val chg = Seq(("a", 2L, "I")).toDF("k", "v", "op")
    val plan = IncrementalAgg.maintainSumCount(base, chg, Seq("k"), "v", "op")
      .queryExecution.optimizedPlan.toString
    // one full-outer join of two aggregates; no re-join of raw base rows
    assert(plan.contains("FullOuter"), s"full-outer merge expected:\n$plan")
  }
}
