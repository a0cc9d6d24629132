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

  /** Exact total-variation distance between the CATEGORY distributions
    * of two corpora/snapshots: TV = ½ Σ_c |P_A(c) − P_B(c)| — the
    * categorical drift monitor (language mix, domain mix, event-type
    * mix between crawls). TV is chosen over PSI/KL deliberately: it is
    * ln-FREE, so every intermediate stays exact integer arithmetic and
    * the score is bit-identical cross-engine (the corpusKeyness χ²
    * principle applied to drift) — PSI's per-bucket ln(pa/pb) has no
    * such guarantee between libm implementations.
    *
    * Exactness: per-category |ca·nb − cb·na| in DECIMAL(38,0) (room
    * for two 10^12-row corpora with 10^14 to spare), summed exactly in
    * any order; the ONE double division at the end divides two
    * deterministically-rounded casts, mirrored term-for-term by the
    * oracle's HUGEINT spelling. NULL is a category like any other
    * (both engines group it).
    *
    * Scale shape: union with side tags → ONE hash shuffle on the
    * category (map-side combinable counts) → a |categories|-sized
    * frame → broadcast 1-row totals → 1-row reduce. Nothing
    * corpus-sized survives the first aggregate; nothing collects. An
    * empty side raises loudly (a TV against nothing is a pipeline bug,
    * not a 0/0).
    *
    * @return ONE row: (tv_dist, n_a, n_b, n_categories) */
  def tvDistance(dfA: DataFrame, dfB: DataFrame, catCol: String): DataFrame = {
    def side(df: DataFrame, a: Int, b: Int) = df
      .select(col(catCol).cast("string").as("c"),
        lit(a.toLong).as("__a"), lit(b.toLong).as("__b"))
    val counts = graft.CacheScope.track(
      side(dfA, 1, 0).unionByName(side(dfB, 0, 1))
        .groupBy("c").agg(sum("__a").as("ca"), sum("__b").as("cb")))
    val totals = counts.agg(coalesce(sum("ca"), lit(0L)).as("na"),
      coalesce(sum("cb"), lit(0L)).as("nb"), count(lit(1)).as("ncat"))
    // the 1-row GLOBAL-agg totals frame is the output spine: a grouped
    // agg over empty counts would emit ZERO rows and skip the
    // empty-side raise entirely (both-sides-empty would silently
    // return an empty frame instead of raising)
    val num = counts.crossJoin(broadcast(totals))
      .select(abs(col("ca").cast("decimal(38,0)") * col("nb")
        - col("cb").cast("decimal(38,0)") * col("na")).as("__num"))
      .agg(coalesce(sum("__num"), lit(0).cast("decimal(38,0)")).as("__num"))
    totals.crossJoin(num)
      .select(
        when(col("na") === 0L || col("nb") === 0L,
          raise_error(lit("tvDistance: a side is empty — no distribution to compare"))
            .cast("double"))
          .otherwise(col("__num").cast("double")
            / (lit(2.0) * col("na").cast("double") * col("nb").cast("double")))
          .as("tv_dist"),
        col("na").as("n_a"), col("nb").as("n_b"),
        col("ncat").as("n_categories"))
  }

  /** Windowed TV drift — [[tvDistance]]'s time-series deployment
    * shape: the exact total-variation distance of EACH event-time
    * window's category distribution against a fixed reference
    * distribution (yesterday's snapshot, the training corpus, a
    * contract mix), i.e. the per-window series a drift dashboard
    * plots and alerts on.
    *
    * The union trick does not need an outer join per window:
    * reference categories ABSENT from a window contribute |0 − cb·na|
    * each, and Σ over the missing set is (nb − Σ_present cb)·na — so
    * one broadcast LEFT join against the reference plus a per-window
    * closed-form missing-mass term covers the full category union.
    *
    * Exactness: identical to [[tvDistance]] — DECIMAL(38,0)
    * cross-products summed order-free per window, ONE double division
    * per output row, HUGEINT-mirrored by the oracle. Scale shape: one
    * (window, category) hash shuffle with map-side combine, then one
    * window-keyed reduce over the compact count frame; the reference
    * is category-sized and broadcast. An empty reference raises
    * loudly.
    *
    * @param events    event frame
    * @param tsUsCol   event-time column, MICROSECONDS (long-castable)
    * @param catCol    category column (NULL is a category)
    * @param windowUs  tumbling-window width, µs
    * @param reference (category, count) frame — exact longs, e.g. a
    *                  prior snapshot's groupBy count
    * @return (window_start, n_events, tv_dist) per non-empty window */
  def windowedTvDrift(events: DataFrame, tsUsCol: String, catCol: String,
                      windowUs: Long, reference: DataFrame,
                      refCatCol: String = "category",
                      refNCol: String = "n"): DataFrame =
    tvCollapse(windowCategoryCounts(events, tsUsCol, catCol, windowUs),
      reference, refCatCol, refNCol)

  /** The `(window_start, c, ca)` tumbling-window category count stage
    * shared by [[windowedTvDrift]] and
    * [[PipelineOps.windowedDiversity]] — the batch twin of
    * [[graft.streaming.StreamingDemo.tvDriftWindowCounts]]'s output
    * table, so every windowed categorical monitor collapses from the
    * identical frame. */
  private[graft] def windowCategoryCounts(events: DataFrame, tsUsCol: String,
                                          catCol: String,
                                          windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    events
      // null event time -> no window (matches the streaming twin's
      // filter; without it null-ts rows pool into a null-keyed window)
      .where(col(tsUsCol).isNotNull)
      // exact integer FLOOR bucketing — `/` on longs is DOUBLE division
      // in Spark (mis-buckets boundary events at epoch-µs magnitudes)
      // and `div` truncates toward zero, which would put pre-1970
      // (negative-µs) events one window later than the streaming
      // twin's window() (which floors): ts − pmod(ts, w) = floor(ts/w)·w
      // exactly, for either sign. The DuckDB oracle mirrors this with
      // the positive-mod spelling — its integer `//` TRUNCATES toward
      // zero too, so neither engine's native division is usable
      .select(expr(s"CAST(`$tsUsCol` AS BIGINT) - pmod(CAST(`$tsUsCol` AS BIGINT), ${windowUs}L)")
          .as("window_start"),
        col(catCol).cast("string").as("c"))
      .groupBy("window_start", "c").agg(count(lit(1)).as("ca"))
  }

  /** The per-window TV reduce over a pre-aggregated
    * `(window_start, c, ca)` count frame — [[windowedTvDrift]]'s
    * second stage, public so the STREAMING stage
    * ([[graft.streaming.StreamingDemo.tvDriftWindowCounts]]'s output
    * table) collapses through the identical arithmetic. */
  def tvCollapse(winCountsIn: DataFrame, reference: DataFrame,
                 refCatCol: String = "category",
                 refNCol: String = "n"): DataFrame = {
    // collapse duplicate reference categories (the contract is an
    // aggregate, but a duplicated row must not double a term)
    val ref = reference
      .select(col(refCatCol).cast("string").as("c"),
        col(refNCol).cast("long").as("__r"))
      .groupBy("c").agg(sum("__r").as("cb"))
    val refTot = ref.agg(coalesce(sum("cb"), lit(0L)).as("nb"))
    // ONE window-keyed aggregation: the per-window total `na` is only
    // known after grouping, so the |ca·nb − cb·na| terms fold over the
    // collected (ca, cb) pairs AFTER the agg (bounded by |categories|
    // per window; exact integers, so the fold order is irrelevant).
    // A winTotals self-join would be the natural spelling but trips
    // conflicting-reference analysis on view-backed inputs (the
    // streaming memory-sink path).
    winCountsIn
      .select(col("window_start"), col("c"), col("ca").cast("long").as("ca"))
      // NULL-SAFE category match (NULL is a category, per the contract
      // above): a plain equality join would leave a NULL window
      // category unmatched even when the reference carries NULL too,
      // double-counting its term (ca·nb unmatched + cb·na missing-mass)
      .join(broadcast(ref.withColumnRenamed("c", "__rc")),
        col("c") <=> col("__rc"), "left")
      .drop("__rc")
      .crossJoin(broadcast(refTot))
      .withColumn("__cb", coalesce(col("cb"), lit(0L)))
      .groupBy("window_start", "nb")
      .agg(sum("ca").as("na"), sum("__cb").as("__cbp"),
        collect_list(struct(col("ca"), col("__cb"))).as("__pairs"))
      .withColumn("__num", aggregate(col("__pairs"),
        lit(0).cast("decimal(38,0)"),
        (acc, x) => acc + abs(x.getField("ca").cast("decimal(38,0)") * col("nb")
          - x.getField("__cb").cast("decimal(38,0)") * col("na"))))
      // missing-mass term joins the numerator while still exact; ONE
      // double cast + division per output row
      .withColumn("__tot", col("__num")
        + (col("nb") - col("__cbp")).cast("decimal(38,0)") * col("na"))
      .select(col("window_start"), col("na").as("n_events"),
        when(col("nb") === 0L,
          raise_error(lit("windowedTvDrift: the reference distribution is empty"))
            .cast("double"))
          .otherwise(col("__tot").cast("double")
            / (lit(2.0) * col("na").cast("double") * col("nb").cast("double")))
          .as("tv_dist"))
  }
}
