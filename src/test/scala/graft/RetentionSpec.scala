package graft

import org.apache.spark.sql.functions._
import graft.operators.Retention

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private val P = 100L // period grain, µs

  private def run(rows: Seq[(Long, Long)]): Map[(Long, Long), (Long, Long, Double)] =
    Retention.cohortRetention(rows.toDF("user_id", "ts_us"),
        "user_id", "ts_us", P)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  test("cohorts, offsets, sizes, and the retention ratio") {
    // cohort 0: users 1,2,3 (first activity in [0,100));
    // cohort 2: user 4. User 1 returns in periods 1 and 2, user 2 in
    // period 2 only, user 3 never. Repeat events in one period count once.
    val r = run(Seq(
      (1L, 10L), (1L, 20L), (1L, 150L), (1L, 250L),
      (2L, 30L), (2L, 260L),
      (3L, 40L),
      (4L, 230L), (4L, 330L)))
    assert(r((0L, 0L)) == ((3L, 3L, 1.0)))
    assert(r((0L, 1L)) == ((1L, 3L, 1.0 / 3.0)))
    assert(r((0L, 2L)) == ((2L, 3L, 2.0 / 3.0)))
    assert(r((2L, 0L)) == ((1L, 1L, 1.0)))
    assert(r((2L, 1L)) == ((1L, 1L, 1.0)))
    assert(r.size == 5, "no rows for inactive (cohort, offset) cells")
  }

  test("offset 0 always exists and carries the full cohort") {
    val r = run(Seq((1L, 5L), (2L, 7L), (3L, 905L)))
    assert(r((0L, 0L)) == ((2L, 2L, 1.0)))
    assert(r((9L, 0L)) == ((1L, 1L, 1.0)))
  }

  test("matches a driver-side fold on a generated 300-user log") {
    val rows = for (u <- 0L until 300L; i <- 0 until 20) yield
      (u, ((u * 31 + i * 97) % 13) * 60 + i * 45)
    val up = rows.map { case (u, t) => (u, t / P) }.distinct
    val cohort = up.groupBy(_._1).map { case (u, ps) => u -> ps.map(_._2).min }
    val grid = up.groupBy { case (u, p) => (cohort(u), p - cohort(u)) }
      .map { case (k, vs) => k -> vs.size.toLong }
    val expected = grid.map { case ((c, o), n) =>
      val size = grid((c, 0L))
      (c, o) -> ((n, size, n.toDouble / size))
    }
    assert(run(rows) == expected)
  }

  test("plan shape: the user-key agg is the only wide exchange; the window runs on the periods-squared frame") {
    val df = Seq((1L, 10L)).toDF("user_id", "ts_us")
    val plan = Retention.cohortRetention(df, "user_id", "ts_us", P)
      .queryExecution.executedPlan.toString
    // exchanges: user groupBy, (cohort, offset) groupBy, cohort window —
    // the latter two run on frames bounded by periods², not by users
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"single-pass shape, no user-frame self-join expected:\n$plan")
  }
}
