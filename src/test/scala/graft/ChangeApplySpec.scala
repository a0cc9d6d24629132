package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.ChangeApply

class ChangeApplySpec extends SparkSpec {
  import spark.implicits._

  private val snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "s", "v")

  private def apply(changes: DataFrame, snapshot: DataFrame = snap) =
    ChangeApply.applyChangelog(snapshot, changes, Seq("k"), "version", "op")
      .as[(Long, String, Double, Long)].collect().toSet

  test("insert, update, delete, and untouched keys") {
    val chg = Seq(
      (2L, "b2", 22.0, 1L, "U"),  // update
      (3L, "c", 30.0, 1L, "D"),   // delete
      (9L, "new", 90.0, 1L, "U")  // insert (no snapshot row needed)
    ).toDF("k", "s", "v", "version", "op")
    assert(apply(chg) == Set(
      (1L, "a", 10.0, -1L),       // untouched: snapshot payload, version -1
      (2L, "b2", 22.0, 1L),
      (9L, "new", 90.0, 1L)))
  }

  test("highest version wins; delete-then-reinsert resurfaces the key") {
    val chg = Seq(
      (2L, "v1", 1.0, 1L, "U"), (2L, "v3", 3.0, 3L, "U"), (2L, "v2", 2.0, 2L, "U"),
      (3L, "x", 0.0, 1L, "D"), (3L, "back", 33.0, 2L, "U")
    ).toDF("k", "s", "v", "version", "op")
    val r = apply(chg)
    assert(r.contains((2L, "v3", 3.0, 3L)))
    assert(r.contains((3L, "back", 33.0, 2L)), "reinsert after delete must win")
  }

  test("same-version tie resolves upsert over delete (struct order, documented)") {
    val chg = Seq(
      (2L, "keep", 2.0, 5L, "U"), (2L, "kill", 2.0, 5L, "D")
    ).toDF("k", "s", "v", "version", "op")
    assert(apply(chg).contains((2L, "keep", 2.0, 5L)))
  }

  test("re-applying the same changelog is idempotent") {
    val chg = Seq(
      (1L, "a1", 11.0, 1L, "U"), (2L, "x", 0.0, 2L, "D"), (7L, "n", 7.0, 1L, "U")
    ).toDF("k", "s", "v", "version", "op")
    val once = ChangeApply.applyChangelog(snap, chg, Seq("k"), "version", "op")
    val twice = ChangeApply.applyChangelog(
      once.drop("last_version"), chg, Seq("k"), "version", "op")
    assert(once.as[(Long, String, Double, Long)].collect().toSet ==
      twice.as[(Long, String, Double, Long)].collect().toSet)
  }

  test("compactChangelog keeps one latest change per key, tombstones included") {
    val chg = Seq(
      (1L, "a1", 1.0, 1L, "U"), (1L, "a2", 2.0, 2L, "U"),
      (2L, "x", 0.0, 1L, "D")
    ).toDF("k", "s", "v", "version", "op")
    val c = ChangeApply.compactChangelog(chg, Seq("k"), "version", "op")
      .select($"k", $"s", $"v", $"version", $"op")
      .as[(Long, String, Double, Long, String)].collect().toSet
    assert(c == Set((1L, "a2", 2.0, 2L, "U"), (2L, "x", 0.0, 1L, "D")))
    // applying the compacted log equals applying the full log
    assert(apply(ChangeApply.compactChangelog(chg, Seq("k"), "version", "op")
        .select($"k", $"s", $"v", $"version", $"op")) == apply(chg))
  }

  test("plan shape: one key shuffle, no window") {
    val chg = Seq((1L, "a1", 1.0, 1L, "U")).toDF("k", "s", "v", "version", "op")
    val plan = ChangeApply.applyChangelog(snap, chg, Seq("k"), "version", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"agg spelling must not window:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected at most the union's agg exchange(s):\n$plan")
  }
}
