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
           approxRows: Long, windowMaxRows: Long = 100000L): DataFrame =
    if (approxRows <= windowMaxRows)
      df.withColumn(outCol, TBasic.rankWindow(valueCol, tieCols))
    else
      zipWithIndexRank(df, valueCol, tieCols, outCol)

  /** Append the 1-based MIN-rank of `valueCol` ascending, nulls first —
    * SQL `RANK()` / pandas `rank(method="min")` semantics: tied values
    * share the rank of their first member. Because equal values ALWAYS
    * get equal ranks, the result needs no tie-break columns and is
    * independent of partitioning and encounter order — the
    * deterministic fallback for ranking keyless tables, where
    * row_number's arbitrary tie order would leak into downstream
    * results ([[graft.operators.CoreT.lda]]).
    *
    * Scale path: only the DISTINCT values are sorted. One groupBy
    * produces per-value counts; a range-partitioned prefix sum over
    * them (driver collects one subtotal per partition, nothing else)
    * assigns each distinct value its min-rank; a join maps ranks back
    * onto the rows. No global window, no single-partition sort.
    */
  def minRankByValue(df: DataFrame, valueCol: String, outCol: String,
                     numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
    val cnt = s"${outCol}__cnt"
    val valOut = s"${outCol}__val"
    // persisted: the subtotal pass and the rank-assignment pass both
    // read it, and re-running the groupBy between them could otherwise
    // (in principle) observe a different physical row order
    val sorted = graft.CacheScope.track(
      df.groupBy(col(valueCol)).agg(count(lit(1)).as(cnt))
        .repartitionByRange(parts, col(valueCol))
        .sortWithinPartitions(col(valueCol)))
    val cntIdx = sorted.schema.fieldIndex(cnt)
    val partTotals = sorted.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(cntIdx))
        Iterator((i, s))
      }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(1L)(_ + _) // min-rank of partition i's first value
    val bOff = spark.sparkContext.broadcast(offsets)
    val rankedRdd = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var next = bOff.value(i)
      it.map { r =>
        val rk = next
        next += r.getLong(cntIdx)
        Row(r.get(0), rk)
      }
    }
    val ranks = spark.createDataFrame(rankedRdd,
      StructType(Seq(sorted.schema(valueCol).copy(name = valOut),
                     StructField(outCol, LongType, nullable = false))))
    // null-safe equality: null feature values form their own rank group
    df.join(ranks, df(valueCol) <=> ranks(valOut), "left").drop(valOut)
  }
}
