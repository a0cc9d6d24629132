package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    // (pid, key, t)
    (1L, "a", 0L), (2L, "a", 10L), (3L, "a", 25L), (4L, "a", 99L),
    (5L, "b", 10L), (6L, "b", -7L), (7L, "c", 50L)
  ).toDF("pid", "key", "t")

  private def intervals = Seq(
    // (iid, key, s, e)
    (100L, "a", 0L, 10L),    // catches t=0,10 (inclusive both ends)
    (101L, "a", 11L, 30L),   // catches t=25
    (102L, "a", 26L, 24L),   // empty interval (e < s): matches nothing
    (103L, "b", -10L, 0L),   // negative range: catches t=-7
    (104L, "d", 0L, 100L)    // key with no points
  ).toDF("iid", "key", "s", "e")

  private def joined(binWidth: Long) =
    RangeJoin.pointInInterval(points, intervals,
      keyCols = Seq("key"), pointTimeCol = "t",
      startCol = "s", endCol = "e", binWidth = binWidth)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  private val expected = Set((1L, 100L), (2L, 100L), (3L, 101L), (6L, 103L))

  test("pointInInterval matches BETWEEN semantics, inclusive both ends") {
    assert(joined(binWidth = 8L) == expected)
  }

  test("result is invariant to binWidth (bins are internal only)") {
    for (w <- Seq(1L, 3L, 10L, 1000L)) {
      assert(joined(w) == expected, s"binWidth=$w changed the result")
    }
  }

  test("a pair is emitted exactly once even when the interval spans many bins") {
    val p = Seq((1L, "k", 500L)).toDF("pid", "key", "t")
    val iv = Seq((9L, "k", 0L, 1000L)).toDF("iid", "key", "s", "e")
    val out = RangeJoin.pointInInterval(p, iv, Seq("key"), "t", "s", "e", binWidth = 7L)
    assert(out.count() == 1L)
  }

  test("negative times floor-divide into the correct bin") {
    val p = Seq((1L, "k", -1L), (2L, "k", -10L), (3L, "k", 0L)).toDF("pid", "key", "t")
    val iv = Seq((9L, "k", -5L, -1L)).toDF("iid", "key", "s", "e")
    val out = RangeJoin.pointInInterval(p, iv, Seq("key"), "t", "s", "e", binWidth = 10L)
      .select("pid").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("an over-wide interval fails loudly instead of exploding") {
    val p = Seq((1L, "k", 5L)).toDF("pid", "key", "t")
    val iv = Seq((9L, "k", 0L, 1000000L)).toDF("iid", "key", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(p, iv, Seq("key"), "t", "s", "e",
        binWidth = 1L, maxBinsPerInterval = 100).collect()
    }
    assert(e.getMessage != null)
  }

  test("point and interval payload columns all carry through") {
    val out = RangeJoin.pointInInterval(points, intervals,
      Seq("key"), "t", "s", "e", binWidth = 10L)
    assert(out.columns.toSet == Set("key", "pid", "t", "iid", "s", "e"))
  }

  test("the plan is an equi-join, not a nested-loop cartesian") {
    val plan = RangeJoin.pointInInterval(points, intervals,
      Seq("key"), "t", "s", "e", binWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must bucket into an equi-join:\n$plan")
  }

  test("colliding non-key column names are rejected") {
    val iv = intervals.withColumnRenamed("iid", "pid")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, iv, Seq("key"), "t", "s", "e", binWidth = 10L)
    }
  }
}
