package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Funnel analysis over an event stream: how far each user advances
  * through an ordered step sequence (view → click → purchase), with a
  * per-step conversion window — the product-analytics staple
  * (Amplitude/Mixpanel-style), here with the greedy-first convention
  * PINNED: the funnel anchors at the user's FIRST step-1 event, and
  * each later step takes the first qualifying event strictly after the
  * previous step within `windowUs`. Greedy-first is deterministic and
  * SQL-replayable (a chain of per-step min() CTEs); it can undercount
  * versus trying every step-1 anchor, which is the convention everyone
  * ships because the maximal variant is quadratic in anchors.
  *
  * Scale shape: ONE hash shuffle on the user key, an in-partition
  * (user, ts) sort (spillable — no single-partition global sort, no
  * per-user window materialization), then a linear per-user state
  * machine in `mapPartitions` — the [[graft.streaming.StreamingDemo]]
  * sessionizeCore pattern: sequential per-key semantics that neither
  * window functions nor aggregates express. The fold is a LAZY
  * iterator (one pending row, constant state): a partition's output
  * is never materialized, so crawl-scale user counts per partition
  * cost O(1) heap beyond the input stream itself. Equal-timestamp ties
  * cannot change the outcome (a same-ts event never satisfies the
  * strictly-after rule, and equal candidates for the same step share
  * their min), so no tie-break column is needed.
  *
  * @param steps    ordered event types; length ≥ 1
  * @param windowUs per-step conversion window, µs (ts_{i+1} − ts_i ≤ windowUs)
  * @return (user_id, steps_completed, t_first, t_last) — µs
  *         timestamps of the anchor and the deepest completed step;
  *         users with no step-1 event emit no row
  */
object Funnel {

  def funnel(events: DataFrame, userCol: String, tsUsCol: String,
             typeCol: String, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size, "steps must be distinct types")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val session = events.sparkSession
    import session.implicits._
    val n = steps.size
    val typed = events.select(col(userCol).cast("long").as("u"),
        col(tsUsCol).cast("long").as("t"), col(typeCol).cast("string").as("y"))
      .where(col("u").isNotNull && col("t").isNotNull)
      .as[(Long, Long, String)]
    typed
      .repartition(col("u"))
      .sortWithinPartitions(col("u"), col("t"))
      .mapPartitions { it =>
        new Iterator[(Long, Long, Long, Long)] {
          private var pending: (Long, Long, Long, Long) = null
          private var user = Long.MinValue
          private var depth = 0; private var tFirst = 0L; private var tLast = 0L
          private def flushInto(): Unit = {
            if (user != Long.MinValue && depth > 0)
              pending = (user, depth.toLong, tFirst, tLast)
            depth = 0
          }
          private def fill(): Unit = {
            while (pending == null && it.hasNext) {
              val (u, t, y) = it.next()
              if (u != user) { flushInto(); user = u }
              if (depth == 0) {
                if (y == steps.head) { depth = 1; tFirst = t; tLast = t }
              } else if (depth < n && y == steps(depth) &&
                         t > tLast && t - tLast <= windowUs) {
                depth += 1; tLast = t
              }
            }
            if (pending == null && !it.hasNext) { flushInto(); user = Long.MinValue }
          }
          override def hasNext: Boolean = { fill(); pending != null }
          override def next(): (Long, Long, Long, Long) = {
            fill(); val r = pending; pending = null; r
          }
        }
      }
      .toDF("user_id", "steps_completed", "t_first", "t_last")
  }
}
