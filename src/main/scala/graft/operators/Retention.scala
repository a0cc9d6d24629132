package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream: bucket users by the period
  * of their FIRST activity (the cohort), then count how many of each
  * cohort come back k periods later — the product-analytics retention
  * triangle (sibling of [[Funnel]]; reference has the event stream,
  * `datagen/events` — this is §2.13 extension surface).
  *
  * Period arithmetic is pure integer µs division (`t div periodUs`),
  * TZ-free like the rest of the events family (the eventsRawNanos
  * precedent) and replayable bit-for-bit in SQL.
  *
  * Scale shape: ONE hash shuffle on the user key does all the heavy
  * lifting — `groupBy(user).agg(min(period), collect_set(period))`.
  * The set is map-side combinable and bounded by the CALENDAR, not the
  * data (a user active every single period for ten years at weekly
  * grain is 522 longs), so no per-user skew is possible and the raw
  * event volume never shuffles — only one pre-aggregated row per
  * (user, partition). The exploded (cohort, offset) frame then
  * re-aggregates to at most periods² rows, and the cohort-size
  * denominator rides a window over THAT tiny frame (its offset-0 row
  * always exists: the cohort period is itself active by definition),
  * never over user-grained data.
  *
  * @param periodUs cohort/offset grain in µs (e.g. 86400000000 = daily)
  * @return (cohort_period, period_offset, n_active, cohort_size,
  *         retention) — retention = n_active / cohort_size, a per-row
  *         division of two exact longs (no reduction-order drift)
  */
object Retention {

  def cohortRetention(events: DataFrame, userCol: String, tsUsCol: String,
                      periodUs: Long): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val ev = events.select(col(userCol).cast("long").as("u"),
        expr(s"cast($tsUsCol as bigint) div $periodUs").as("p"))
      .where(col("u").isNotNull && col("p").isNotNull)
    val perUser = ev.groupBy("u")
      .agg(min("p").as("cohort_period"), collect_set("p").as("ps"))
    val grid = perUser
      .select(col("cohort_period"), explode(col("ps")).as("__p"))
      .select(col("cohort_period"),
        (col("__p") - col("cohort_period")).as("period_offset"))
      .groupBy("cohort_period", "period_offset")
      .agg(count(lit(1)).as("n_active"))
    grid
      .withColumn("cohort_size",
        max(when(col("period_offset") === 0, col("n_active")))
          .over(Window.partitionBy("cohort_period")))
      .withColumn("retention", col("n_active") / col("cohort_size"))
  }
}
