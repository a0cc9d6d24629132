package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Exact two-sample Kolmogorov–Smirnov drift statistic — the
  * distribution-shift alarm between two corpora/snapshots of a numeric
  * column (did document lengths, quality scores, or prices move
  * between crawls?): D = max over values of |CDF_A(v) − CDF_B(v)|,
  * computed EXACTLY (no binning, no sampling).
  *
  * The hard part at scale is the cumulative: SQL's natural spelling is
  * a global `SUM() OVER (ORDER BY value)` — the single-partition
  * funnel this repo routes around everywhere ([[Rank]]). Here the
  * cumulative runs as a DISTRIBUTED PREFIX SUM over the per-value
  * count frame (the [[PipelineOps.shardPack]] two-pass pattern:
  * range-partition by value, per-partition subtotals to the driver —
  * one pair of longs per partition — then a broadcast-offset local
  * scan). The count frame is |distinct values| rows, already reduced
  * by the one hash shuffle both sides pay; nothing else is
  * corpus-sized.
  *
  * Exactness: counts and cumulatives are exact longs; the only double
  * arithmetic is the per-row `|ca/n − cb/m|`, mirrored textually by
  * the oracle (which CAN afford the global window at gate scale), and
  * the (gap DESC, value ASC) argmax tiebreak is total — hash-exact by
  * construction.
  *
  * @return ONE row: (ks_stat, at_value, n_a, n_b) — the supremum gap,
  *         the smallest value attaining it, and the sample sizes */
object Drift {

  def ksTwoSample(dfA: DataFrame, dfB: DataFrame, valCol: String): DataFrame = {
    val spark = dfA.sparkSession
    def side(df: DataFrame, a: Int, b: Int) = df
      .select(col(valCol).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
      .select(col("v"), lit(a.toLong).as("__a"), lit(b.toLong).as("__b"))
    val counts = graft.CacheScope.track(
      side(dfA, 1, 0).unionByName(side(dfB, 0, 1))
        .groupBy("v").agg(sum("__a").as("na"), sum("__b").as("nb")))
    val totals = counts.agg(coalesce(sum("na"), lit(0L)).as("n"),
      coalesce(sum("nb"), lit(0L)).as("m"))
    val parts = spark.sessionState.conf.numShufflePartitions
    // distributed prefix sum over the value-ordered count frame
    val sorted = graft.CacheScope.track(counts
      .repartitionByRange(parts, col("v")).sortWithinPartitions(col("v")))
    val (ia, ib) = (sorted.schema.fieldIndex("na"), sorted.schema.fieldIndex("nb"))
    val partials = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var sa = 0L; var sb = 0L
      it.foreach { r => sa += r.getLong(ia); sb += r.getLong(ib) }
      Iterator((i, sa, sb))
    }.collect().sortBy(_._1)
    val offA = partials.map(_._2).scanLeft(0L)(_ + _)
    val offB = partials.map(_._3).scanLeft(0L)(_ + _)
    val bOffA = spark.sparkContext.broadcast(offA)
    val bOffB = spark.sparkContext.broadcast(offB)
    val iv = sorted.schema.fieldIndex("v")
    val cum = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var ca = bOffA.value(i); var cb = bOffB.value(i)
      it.map { r =>
        ca += r.getLong(ia); cb += r.getLong(ib)
        Row(r.getDouble(iv), ca, cb)
      }
    }
    spark.createDataFrame(cum, StructType(Seq(
        StructField("v", DoubleType), StructField("ca", LongType),
        StructField("cb", LongType))))
      .crossJoin(totals)
      .select(
        expr("""abs(CAST(ca AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(cb AS DOUBLE) / CAST(m AS DOUBLE))""").as("ks_stat"),
        col("v").as("at_value"), col("n").as("n_a"), col("m").as("n_b"))
      .orderBy(col("ks_stat").desc, col("at_value").asc)
      .limit(1)
  }
}
