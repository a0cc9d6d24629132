package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge overlapping/adjacent intervals per key — the span-coalescing
  * primitive (union of [[Dedup.exactSubstrDedup]]-style match spans,
  * user activity coverage from events, downtime windows, genomic-style
  * range flattening). Two intervals merge when they overlap or touch:
  * `next.start ≤ running_max(end) + adjacency`.
  *
  * The classic islands-and-gaps construction, fully window-relational
  * (no per-key UDF state): sort each key's intervals by (start, end),
  * take the RUNNING MAX of the end bound over all PRECEDING rows, mark
  * an island head wherever the current start exceeds it (+ adjacency),
  * prefix-sum the heads into island ids, then one groupBy collapses
  * each island to its (min start, max end, member count). Pure integer
  * comparisons throughout — trivially hash-gateable, and the oracle is
  * the same three windows in SQL.
  *
  * Scale shape: ONE hash shuffle on the key; every window is
  * partitioned BY THE KEY (in-partition sort, spillable — never a
  * bare global `Window.orderBy`, the [[Rank]] single-partition funnel
  * this repo routes around), and the final groupBy is map-side
  * combinable. A key with a billion intervals costs a linear
  * in-partition scan.
  *
  * @param adjacency intervals whose gap is ≤ `adjacency` also merge
  *                  (0 = touching merges, -1 = only true overlaps)
  * @return (key, span_start, span_end, n_merged) */
object Intervals {

  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String, adjacency: Long = 0L): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    val head = when(prevMax.isNull ||
      col(startCol) > prevMax + lit(adjacency), 1L).otherwise(0L)
    df.withColumn("__head", head)
      .withColumn("__island", sum(col("__head"))
        .over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
