package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join: every (point, interval) pair sharing
  * the equality keys with `start <= t <= end` (inclusive both ends —
  * SQL `BETWEEN` semantics). The enrichment join behind "which
  * promotions was this click inside", ad attribution windows, sensor
  * reading ↔ maintenance window, and the interval-overlap half of a
  * genomics/telemetry workload.
  *
  * Spark plans a raw `l.t BETWEEN r.s AND r.e` predicate as a per-key
  * cartesian filter (BroadcastNestedLoop when keyless) — O(n·m) per
  * key, the classic range-join explosion [[AsofJoin]] documents. This
  * operator bins time instead: intervals replicate to each `binWidth`
  * bucket they overlap, points hash to the single bucket containing
  * them, and an EQUI-join on (keys, bucket) + an exact residual filter
  * recovers precisely the BETWEEN matches. Each matching pair meets in
  * exactly one bucket (the point's), so no post-join dedup is needed —
  * the join is shuffle-hash/sort-merge-able and scales like any other
  * equi-join.
  *
  * Cost model: interval replication factor is `span/binWidth + 1`, so
  * pick `binWidth` near the typical interval length (replication ≈ 2×).
  * An interval spanning more than `maxBinsPerInterval` buckets fails
  * LOUDLY at execution (raise_error) instead of silently materializing
  * an unbounded explode — resize `binWidth` or split the interval
  * upstream. Bucket arithmetic is exact long floor-division (no double
  * rounding on epoch-scale values); negative times work.
  */
object RangeJoin {

  /** Floor division for time values (`div` truncates toward zero, which
    * would mis-bin negative times). The `w·floor(q/w)` numerator passes
    * through a double, exact for |t| < 2^53 — every epoch-µs/ms/s
    * domain; pre-scale epoch NANOS upstream (they reach 2^60). */
  private def floorDiv(x: Column, w: Long): Column = {
    val q = x.cast("long")
    ((q - pmod(q, lit(w))) / lit(w)).cast("long")
  }

  /** @param points    probe rows; each output row carries all of them
    * @param intervals interval rows; all their non-key columns are
    *                  carried (start/end included — callers usually
    *                  want the window bounds)
    * @param keyCols   equality keys present in both frames
    * @param pointTimeCol point-side time column (integral)
    * @param startCol  interval-side inclusive lower bound (integral)
    * @param endCol    interval-side inclusive upper bound; rows with
    *                  `end < start` are empty intervals and match
    *                  nothing (dropped, not an error)
    * @param binWidth  bucket width in time units; choose ≈ the typical
    *                  interval span
    * @param maxBinsPerInterval loud-failure ceiling on per-interval
    *                  replication
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCols: Seq[String], pointTimeCol: String,
                      startCol: String, endCol: String,
                      binWidth: Long,
                      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(keyCols.nonEmpty, "pointInInterval needs at least one key column")
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval must be >= 1")
    val keyLower = keyCols.map(_.toLowerCase).toSet
    val ivPayload = intervals.columns.filterNot(c => keyLower.contains(c.toLowerCase))
    val clash = points.columns.map(_.toLowerCase).toSet
      .intersect(ivPayload.map(_.toLowerCase).toSet)
    require(clash.isEmpty,
      s"non-key column names must be disjoint between the two frames; both have: ${clash.mkString(", ")}")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "__bin is the reserved internal column name")

    val b0 = floorDiv(col(startCol), binWidth)
    val b1 = floorDiv(col(endCol), binWidth)
    val nBins = b1 - b0 + 1
    // raise_error is reached only for over-wide intervals: when_
    // otherwise keeps the error branch out of the common path, and the
    // message carries the actual span so the failure is actionable
    val binSeq = when(col(endCol) < col(startCol), array().cast("array<bigint>"))
      .when(nBins > maxBinsPerInterval,
        raise_error(concat(
          lit(s"pointInInterval: interval spans more than $maxBinsPerInterval bins of width $binWidth ("),
          nBins.cast("string"), lit(") — widen binWidth or split the interval")))
          .cast("array<bigint>"))
      .otherwise(sequence(b0.cast("long"), b1.cast("long")))
    val iv = intervals.select(keyCols.map(col) ++ ivPayload.map(col) :+
      explode(binSeq).as("__bin"): _*)
    val pt = points.withColumn("__bin", floorDiv(col(pointTimeCol), binWidth).cast("long"))
    pt.join(iv, keyCols :+ "__bin")
      .where(col(pointTimeCol) >= col(startCol) && col(pointTimeCol) <= col(endCol))
      .drop("__bin")
  }
}
