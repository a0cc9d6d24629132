package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-path global ranking.
  *
  * The reference ranks with pandas rank(method="first") on ≤400 rows
  * (Tengine.py:107-108). The naive Spark translation —
  * `row_number().over(Window.orderBy(c))` — funnels every row through a
  * single partition, which is exactly the kind of plan that dies at
  * 100 TB. This implementation range-partitions by the sort key, sorts
  * within partitions, and assigns contiguous indices via
  * `zipWithIndex` (one extra count job for partition offsets, no
  * single-partition shuffle).
  */
object Rank {

  /** Append a 1-based dense global rank (`outCol`) of `valueCol`
    * ordered ascending, ties broken by `tieCols` — semantics identical
    * to [[TBasic.rankWindow]] but shuffle-friendly.
    */
  def zipWithIndexRank(df: DataFrame, valueCol: String, tieCols: Seq[String],
                       outCol: String, numPartitions: Int = 0): DataFrame = {
    val sortCols = (valueCol +: tieCols).map(col)
    val parts = if (numPartitions > 0) numPartitions
                else df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val withIdx = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(withIdx,
      StructType(sorted.schema.fields :+ StructField(outCol, LongType, nullable = false)))
  }

  /** Pick the right rank implementation by estimated size: window rank
    * keeps whole-stage codegen for chart-scale frames; zipWithIndex for
    * anything large. */
  def rank(df: DataFrame, valueCol: String, tieCols: Seq[String], outCol: String,
           approxRows: Long, windowMaxRows: Long = 1000000L): DataFrame =
    if (approxRows <= windowMaxRows)
      df.withColumn(outCol, TBasic.rankWindow(valueCol, tieCols))
    else
      zipWithIndexRank(df, valueCol, tieCols, outCol)
}
