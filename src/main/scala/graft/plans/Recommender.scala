package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{EngineConfig, TableProfile}
import graft.operators.{ChartAssembly, CoreT, TStep}
import graft.score.{Scagnostics, Significance}

/** A recommended chart: type, channel descriptions, score, and the
  * (bounded) data series for rendering.
  *
  * `signature` identifies the chart exactly (coreT + full tpath
  * fingerprint per channel); `dedupKey` is the reference's coarser
  * duplicate-removal identity — chart type + per-channel OPERATOR-NAME
  * sequence with the column lists ignored (search.py:1280-1299 keys on
  * `t["t"]`/`t["name"]` only), so two same-shaped derivations over
  * different column sets count as one chart. */
final case class ChartRec(
    chartType: String,
    channels: Map[String, String], // channel → "coreT | tpath fingerprint"
    columns: Map[String, Seq[String]], // channel → output columns
    score: Double,
    signature: String,
    dedupKey: String,
    data: Seq[Map[String, Any]])

final case class Recommendation(visList: Seq[ChartRec], graphJson: String)

/** The five-phase search pipeline (SURVEY §3.2): presearch (tpath
  * enumeration per core transform), stree channel matching,
  * memoized execution, chart assembly, scoring + top-k + dedup +
  * provenance graph.
  *
  * Phase structure vs the reference (search.py:46-308, 687-1443):
  *  - enumeration and channel matching are pure driver logic;
  *  - each (coreT, tpath) executes ONCE as a Spark plan and is cached
  *    by fingerprint (the reference memoizes on pickled keys,
  *    search.py:293-298);
  *  - the reference's per-core-T OS processes (search.py:55-63)
  *    disappear: Spark's scheduler is the parallelism substrate;
  *  - chart data is bounded (`maxChartRows`) before driver-side
  *    scoring, so scoring cost is independent of table size.
  */
object Recommender {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Default tpath-failure hook: warn once per core T (the search loop
    * is forgiving like the reference's, search.py:246-308, but a
    * systematic failure must not degrade to "fewer charts" silently). */
  private def logFailure(coreT: String, fingerprint: String, e: Throwable): Unit =
    log.warn(s"tpath execution failed for coreT=$coreT (tpath $fingerprint); " +
      s"further $coreT failures suppressed: $e")

  private def chartFamilies(catLine: Boolean): Map[String, Seq[String]] = Map(
    "scatter" -> Seq("num_scatter", "cat_scatter"),
    // the cat-y line kinds are gated by CAT_LINE like the reference
    // (config.py:22, main.py:83-90)
    "line" -> (Seq("ord_line", "rel_line") ++
      (if (catLine) Seq("ord_cat_line", "rel_cat_line") else Nil)),
    "bar" -> Seq("sum_bar", "count_bar"))

  /** V.py channel contracts: channel → (dim, type); dim None = multi. */
  private val vlist: Map[String, Map[String, (Option[Int], String)]] = Map(
    "num_scatter" -> Map("xy" -> (Some(2), "num"), "color" -> (Some(1), "num")),
    "cat_scatter" -> Map("xy" -> (Some(2), "num"), "color" -> (Some(1), "cat")),
    "ord_line" -> Map("y" -> (None, "num")),
    "ord_cat_line" -> Map("y" -> (Some(1), "cat")),
    "rel_line" -> Map("x" -> (Some(1), "num"), "y" -> (None, "num")),
    "rel_cat_line" -> Map("x" -> (Some(1), "num"), "y" -> (Some(1), "cat")),
    "sum_bar" -> Map("x" -> (Some(1), "cat"), "y" -> (None, "num")),
    "count_bar" -> Map("x" -> (Some(1), "cat")))

  private final case class Executed(coreT: String, tpath: TPathCandidate, df: DataFrame,
                                    outCols: Seq[String]) {
    /** Output columns with tpath-derived (created) columns first — the
      * reference's series preference when capping lines/bars per chart
      * (search.py:940-947, 1048-1055). */
    def outColsDerivedFirst: Seq[String] = {
      val derived = tpath.steps.flatMap(_.outName).toSet
      outCols.filter(derived.contains) ++ outCols.filterNot(derived.contains)
    }
  }

  /** Dimension-reduction / clustering core Ts: shared tpath enumeration
    * (threadsharing, T.py:192-199), per-T candidate cap 3, channel
    * alignment rule. */
  private val dmTs = Set("pca", "mds", "tsne", "umap", "kmeans", "dbscan", "lda")

  /** Collision-renaming key join of two channel frames — the ONE
    * spelling shared by the search pipeline and Engine.buildChart's
    * interactive rebuild, so the two paths cannot diverge: right-side
    * columns that collide with the left get a `__y` suffix, and the
    * returned column list reflects the renames. */
  private[graft] def joinOnKey(key: Seq[String])(
      left: DataFrame, right: DataFrame,
      rightCols: Seq[String]): (DataFrame, Seq[String]) = {
    val leftSet = left.columns.toSet
    val renames = rightCols.filter(leftSet.contains).map(c => c -> (c + "__y")).toMap
    val r2 = renames.foldLeft(right) { case (d, (o, n)) => d.withColumnRenamed(o, n) }
    (left.join(r2, key), rightCols.map(c => renames.getOrElse(c, c)))
  }

  /** @param tlist restrict core transforms considered for channels —
    *        the /vis/search "tlist" parameter (main.py:91-94). The four
    *        null passthroughs are always admitted, exactly like the
    *        reference appends them to any client tlist; None = all.
    * @param slist enabled score metrics — the /vis/search "slist"
    *        toggles (score.py:10-28, main.py:97): a chart's score is
    *        the unweighted mean of its ENABLED metrics (search.py:792).
    *        None = this engine's default metric set — which INCLUDES
    *        "sca_striated", matching the reference's default slist
    *        (score.py:21); an explicit set filters the default
    *        metrics down to the named ones. */
  def recommend(df: DataFrame, profile: TableProfile, spark: SparkSession,
                cfg: EngineConfig = EngineConfig.default,
                charts: Seq[String] = Seq("scatter", "line", "bar"),
                maxChartRows: Int = 4000,
                maxCandidatesPerChannel: Int = 12,
                onExecutionFailure: (String, String, Throwable) => Unit = logFailure,
                tlist: Option[Set[String]] = None,
                slist: Option[Set[String]] = None): Recommendation = {
    // mean-of-enabled (search.py:792); empty → 0 like utils.mean's
    // safe default on an all-disabled slist
    def enabled(name: String): Boolean = slist.forall(_.contains(name))
    def meanOf(xs: Seq[Double]): Double = if (xs.isEmpty) 0.0 else xs.sum / xs.size
    // the reference's cs-dict for every line/bar kind (bars
    // search.py:978-990, ord lines 1073-1084, rel lines 1204-1214):
    // each enabled metric is computed independently — outno1 and lincor
    // as per-series means, cor as the mean pairwise correlation over
    // ≥2 series — and the chart scores their mean. Deviation note: for
    // ord lines the reference passes the (rows × cols) value matrix to
    // significance_correlation, pairing ROWS as if they were series —
    // a numpy-orientation accident its own bar and rel-line paths
    // don't share (both pair columns explicitly); columns are paired
    // everywhere here.
    def lineScore(series: Seq[Array[Double]]): Double = {
      val cs = Seq.newBuilder[Double]
      if (enabled("lin_outstanding1")) cs += meanOf(series.map(Significance.outstanding1))
      if (enabled("lin_linearness")) cs += meanOf(series.map(Significance.linearness))
      if (series.length >= 2 && enabled("lin_correlation"))
        cs += Significance.correlation(series.toArray)
      meanOf(cs.result())
    }
    val key = profile.keyColumn.toSeq
    // the source frame feeds every (coreT, tpath) execution — keep it hot
    df.persist()

    // ── presearch: enumerate pools, shared across DM core Ts
    //    (threadsharing, T.py:192-199) ─────────────────────────────────
    val dmShared = Enumerator.dedupe(Enumerator.enumerate(profile, "pca", cfg))
    def pool(t: String): Seq[TPathCandidate] =
      if (dmTs.contains(t)) dmShared
      else Enumerator.dedupe(Enumerator.enumerate(profile, t, cfg))

    // ── memoized execution (one Spark plan per (coreT, tpath)),
    //    submitted CONCURRENTLY: the reference parallelizes with one OS
    //    process per core T (search.py:55-63); here concurrent job
    //    submission on the shared SparkSession is the substrate, and
    //    the future-valued memo makes concurrent requests for the same
    //    fingerprint share one execution ─────────────────────────────
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    val execPool = Executors.newFixedThreadPool(cfg.searchParallelism, (r: Runnable) => {
      val t = new Thread(r, "graft-recommender")
      t.setDaemon(true)
      t
    })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(execPool)
    val memo = mutable.Map[String, Future[Option[Executed]]]()
    // failures stay forgiving (the reference's search loop drops a
    // failed tpath and moves on) but never silent: the FIRST failure
    // per core T reaches `onExecutionFailure` (default: slf4j warn)
    val failureReported = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def executeF(coreT: String, tp: TPathCandidate): Future[Option[Executed]] =
      memo.synchronized {
        memo.getOrElseUpdate(s"$coreT :: ${tp.fingerprint}", Future {
          try CoreT.transform(df, coreT, tp.steps, key, cfg.notCalcuDmT,
            profile.rows, cfg.windowRankMaxRows,
            embedSampleAbove = if (cfg.searchEmbedTs && cfg.searchEmbedSampleFit)
              cfg.searchEmbedMaxRows else 0L,
            distincts = profile.distinctCounts).map { out =>
            val outCols = out.columns.filterNot(key.contains).toSeq
            Executed(coreT, tp, out, outCols)
          } catch {
            case e: Exception =>
              if (failureReported.add(coreT)) onExecutionFailure(coreT, tp.fingerprint, e)
              None
          }
        })
      }
    /** Key-join two channel frames, renaming colliding non-key columns
      * on the right so downstream references stay unambiguous. Returns
      * the joined frame + the (possibly renamed) right column names. */
    def joinChannels(left: DataFrame, right: DataFrame,
                     rightCols: Seq[String]): (DataFrame, Seq[String]) =
      joinOnKey(key)(left, right, rightCols)

    // static output-dimension prediction, so only dimension-compatible
    // tpaths are ever executed (channel dim == T output dim,
    // search.py:131)
    def predictedDim(coreT: String, tp: TPathCandidate): Option[Int] = coreT match {
      case "pca" | "mds" | "tsne" | "umap" => Some(2)
      case "kmeans" | "dbscan" | "lda" => Some(1)
      case _ => // null passthroughs: simulate the column set
        var cols: Option[Seq[String]] = Some(Nil)
        tp.steps.foreach { s =>
          cols = (s.op, s.outMode, s.inType) match {
            case ("select", _, "==") => Some(s.inCols)
            case ("select", _, _) => None // like-select: dynamic
            case ("rank", _, _) => cols
            case (_, "append", _) => cols.map(_ ++ s.outName.toSeq)
            case (_, "new_table", _) => Some(s.outName.toSeq)
            case _ => cols
          }
        }
        cols.map(_.size)
    }

    // channel candidates: executed results matching (dim, type) — all
    // dimension-compatible tpaths dispatched in parallel, then gathered
    // tsne/umap are in the reference's default search tlist (main.py:91,
    // T.py:180) and in ours — but they are driver-side fits, so beyond
    // cfg.searchEmbedMaxRows (default: the reference's own 400-row
    // scale) the search skips them rather than collect-and-fit per
    // candidate — unless searchEmbedSampleFit opts into the
    // sampled-fit out-of-sample path; see the EngineConfig scaladoc
    val embedSampling = cfg.searchEmbedTs && cfg.searchEmbedSampleFit &&
      profile.rows > cfg.searchEmbedMaxRows
    val embedOk = (cfg.searchEmbedTs && profile.rows <= cfg.searchEmbedMaxRows) ||
      embedSampling
    // client tlist restriction + the always-admitted null passthroughs
    // (main.py:92-94)
    val allowedTs = tlist.map(_ ++ Set("null_num", "null_num1", "null_nom", "null_nom1"))
    // Statically-doomed candidates must not occupy pre-execution
    // slots: CoreT.transform rejects null_num1 tpaths WITHOUT
    // arithmetic (Tengine.py:65-67) and notCalcuDmT rejects
    // dimension-reducing tpaths WITH it. The reference executes its
    // whole pool, so its execution-time rejections cost nothing; our
    // take(perT) scale cap slices BEFORE execution, and on a wide
    // table the (always-rejected) null_num1 single-selects alone
    // filled every slot — silently eliminating the arithmetic
    // null_num1 charts the reference produces (WideTableSearchSpec
    // pins the fix). The filter mirrors the execution rule exactly,
    // so the slice only ever spends slots on candidates that can
    // actually run.
    def staticallyViable(t: String, tp: TPathCandidate): Boolean = {
      lazy val hasArith = tp.steps.exists(s => CoreT.arithmeticOps.contains(s.op))
      if (t == "null_num1") hasArith
      else if (cfg.notCalcuDmT && CoreT.dimensionReducing.contains(t)) !hasArith
      else true
    }
    // memoized per (dim, ctype): the line/bar families re-request the
    // same candidate lists (rel_cat_line once per cat-y candidate) and
    // each rebuild re-ran enumeration + dedup + the gather, all
    // deterministic — pure wasted driver CPU (execution itself was
    // always memoized by fingerprint)
    val candCache = mutable.Map[(Option[Int], String), Seq[Executed]]()
    def candidates(dim: Option[Int], ctype: String): Seq[Executed] =
      candCache.getOrElseUpdate((dim, ctype), candidatesUncached(dim, ctype))
    def candidatesUncached(dim: Option[Int], ctype: String): Seq[Executed] = {
      val ts = if (ctype == "num") Enumerator.numTl else Enumerator.catTl
      val work: Seq[(String, TPathCandidate)] =
        ts.filter(t => allowedTs.forall(_.contains(t)))
          .filter(t => embedOk || (t != "tsne" && t != "umap")).flatMap { t =>
          val perT = if (dmTs.contains(t)) 3 else maxCandidatesPerChannel
          pool(t)
            .filter(tp => staticallyViable(t, tp))
            .filter(tp => predictedDim(t, tp).forall(d => dim.forall(_ == d)))
            .take(perT).map(t -> _)
        }
      val gathered = Await.result(
        Future.sequence(work.map { case (t, tp) => executeF(t, tp) }), cfg.searchTimeout)
      val ok = gathered.flatten.filter { ex =>
        dim.forall(_ == ex.outCols.size) && ex.outCols.nonEmpty
      }
      // Null passthroughs are the reference's always-admitted channels
      // (main.py:92-94); the scale cap must not crowd them out now that
      // the embed family alone can fill every slot (4 DM Ts × 3 = 12
      // since sampled fit became the default). They sit last in
      // numTl/catTl, so appending keeps the tlist candidate order.
      val (nulls, rest) = ok.partition(_.coreT.startsWith("null_"))
      rest.take(maxCandidatesPerChannel) ++ nulls
    }

    // alignment rule (ONLYVISUALIZESELECTIONMATCHINGCHANNELS,
    // search.py:734-737): channels from DM core Ts must come from the
    // same final selection
    def aligned(a: Executed, b: Executed): Boolean =
      if (dmTs.contains(a.coreT) && dmTs.contains(b.coreT))
        a.tpath.fingerprint == b.tpath.fingerprint
      else true

    def collect2(ex: Executed, cols: Seq[String]): Array[(Double, Double)] =
      ex.df.select(cols.map(c => col(c).cast("double")): _*)
        .na.drop().limit(maxChartRows).collect()
        .map(r => (r.getDouble(0), r.getDouble(1)))

    val recs = mutable.ArrayBuffer[ChartRec]()

    val enabledTypes = charts.flatMap(chartFamilies(cfg.catLine).getOrElse(_, Nil))

    try {

    // ── scatter families ─────────────────────────────────────────────
    if (enabledTypes.contains("num_scatter") || enabledTypes.contains("cat_scatter")) {
      val xys = candidates(Some(2), "num")
      val numColors = candidates(Some(1), "num")
      val catColors = candidates(Some(1), "cat")
      for (xy <- xys) {
        val pts = collect2(xy, xy.outCols)
        if (pts.length >= Scagnostics.DotNumLimit) {
          val g = new Scagnostics.Graph(pts)
          // per-flag metric selection (search.py:763-792); striated is
          // in the reference's default slist (score.py:21), so it is
          // default-enabled here too (round-6 parity fix — the golden
          // pin was regenerated with it)
          val base = Seq(
            "sca_outlying" -> (() => g.outlying),
            "sca_skewed" -> (() => 100 - g.skewed),
            "sca_striated" -> (() => g.striated),
            "sca_stringy" -> (() => g.stringy),
            "sca_straight" -> (() => g.straight),
            "sca_clumpy" -> (() => 100 - g.clumpy),
            "sca_monotonic" -> (() => g.monotonic)
          ).collect { case (n, v) if enabled(n) => v() }
          if (enabledTypes.contains("num_scatter")) {
            for (c <- numColors.filter(aligned(xy, _)).take(3)) {
              recs += chartRec("num_scatter", Map("xy" -> xy, "color" -> c), meanOf(base), maxChartRows, key)
            }
            if (numColors.isEmpty)
              recs += chartRec("num_scatter", Map("xy" -> xy), meanOf(base), maxChartRows, key)
          }
          if (enabledTypes.contains("cat_scatter")) {
            for (c <- catColors.filter(aligned(xy, _)).take(3)) {
              // CDM needs the label column joined on the key
              val joined = xy.df.join(c.df, key).na.drop()
                .select((xy.outCols.map(cc => col(cc).cast("double")) :+
                  col(c.outCols.head).cast("string")): _*)
                .limit(maxChartRows).collect()
              if (joined.nonEmpty) {
                val pts2 = joined.map(r => (r.getDouble(0), r.getDouble(1)))
                val labelStrs = joined.map(_.getString(2))
                // numeric labels (kmeans/dbscan) keep their values so
                // DBSCAN's -1 outliers stay negative and are skipped by
                // the CDM histograms (score.py:61-70 convention);
                // string categories get sorted-distinct codes
                val labels: Array[Long] =
                  if (labelStrs.forall(s => scala.util.Try(s.toLong).isSuccess))
                    labelStrs.map(_.toLong)
                  else {
                    val codes = labelStrs.distinct.sorted.zipWithIndex.toMap
                    labelStrs.map(s => codes(s).toLong)
                  }
                val withCdm =
                  if (enabled("sca_cdm")) base :+ Scagnostics.cdm(pts2, labels) else base
                recs += chartRec("cat_scatter", Map("xy" -> xy, "color" -> c),
                  meanOf(withCdm), maxChartRows, key)
              }
            }
          }
        }
      }
    }

    // ── line families ────────────────────────────────────────────────
    if (enabledTypes.contains("ord_line") || enabledTypes.contains("rel_line")) {
      val ys = candidates(None, "num").filter(_.outCols.nonEmpty)
      for (y <- ys.take(6)) {
        // prefer derived columns, cap series per chart (search.py:940-947)
        val series = y.outColsDerivedFirst.take(cfg.maxLineNumInChart)
        val rows = y.df.select(series.map(c => col(c).cast("double")): _*)
          .na.drop().limit(maxChartRows).collect()
        if (rows.length >= 3) {
          val cols = series.indices.map(i => rows.map(_.getDouble(i)).toArray).toArray
          if (enabledTypes.contains("ord_line")) {
            recs += chartRec("ord_line", Map("y" -> y),
              lineScore(cols.toSeq), maxChartRows, key)
          }
        }
      }
      if (enabledTypes.contains("rel_line")) {
        val xs = candidates(Some(1), "num")
        for (x <- xs.take(3); y <- ys.take(3) if aligned(x, y) &&
             x.tpath.fingerprint != y.tpath.fingerprint) {
          val (jf, yCols) = joinChannels(x.df, y.df, y.outColsDerivedFirst)
          val joined = jf.na.drop()
            .orderBy(col(x.outCols.head))
            .select(((x.outCols.head +: yCols.take(cfg.maxLineNumInChart))
              .map(c => col(c).cast("double"))): _*)
            .limit(maxChartRows).collect()
          if (joined.length >= 3) {
            val ySeries = (1 until joined.head.length)
              .map(i => joined.map(_.getDouble(i)).toArray).toSeq
            recs += chartRec("rel_line", Map("x" -> x, "y" -> y),
              lineScore(ySeries), maxChartRows, key)
          }
        }
      }
    }

    // ── cat-line families (CAT_LINE=true only): category channel is
    //    encoded to sorted-distinct codes inline, exactly like the
    //    chart-side twin of nominalize (search.py:1059-1067), then
    //    scored with the line significance tests ────────────────────
    if (enabledTypes.contains("ord_cat_line") || enabledTypes.contains("rel_cat_line")) {
      val catYs = candidates(Some(1), "cat")
      def codesOf(rows: Array[String]): Array[Double] = {
        val codebook = rows.distinct.sorted.zipWithIndex.toMap
        rows.map(codebook(_).toDouble)
      }
      for (y <- catYs.take(3)) {
        def catLineScore(codes: Array[Double]): Double = lineScore(Seq(codes))
        if (enabledTypes.contains("ord_cat_line")) {
          val labels = y.df.select(col(y.outCols.head).cast("string"))
            .na.drop().limit(maxChartRows).collect().map(_.getString(0))
          if (labels.length >= 3) {
            recs += chartRec("ord_cat_line", Map("y" -> y),
              catLineScore(codesOf(labels)), maxChartRows, key)
          }
        }
        if (enabledTypes.contains("rel_cat_line")) {
          for (x <- candidates(Some(1), "num").take(2) if aligned(x, y)) {
            val joined = x.df.join(y.df, key).na.drop()
              .orderBy(col(x.outCols.head))
              .select(col(y.outCols.head).cast("string"))
              .limit(maxChartRows).collect().map(_.getString(0))
            if (joined.length >= 3) {
              recs += chartRec("rel_cat_line", Map("x" -> x, "y" -> y),
                catLineScore(codesOf(joined)), maxChartRows, key)
            }
          }
        }
      }
    }

    // ── bar families (the group-agg charts) ──────────────────────────
    if (enabledTypes.contains("sum_bar") || enabledTypes.contains("count_bar")) {
      val xs = candidates(Some(1), "cat")
      val ys = candidates(None, "num")
      for (x <- xs.take(4)) {
        val xCol = x.outCols.head
        if (enabledTypes.contains("sum_bar")) {
          // slice 6, not 3: the reference scores EVERY y candidate
          // (search.py:930-, utils.py:15 tocontinue filters only
          // user-given indices) and lets the family top-k decide; our
          // bounded slice must at least span all six numTl families —
          // at 3, the default-on embed candidates (pca/tsne/mds/umap
          // fill the head of the list) crowd out the null passthroughs
          // that score highest at the gate fixture
          for (y <- ys.take(6) if aligned(x, y)) {
            val joined = x.df.join(y.df, key)
            val series = y.outColsDerivedFirst.take(cfg.maxBarNumInChart)
            val agg = ChartAssembly.sumBar(joined, xCol, series)
              .orderBy(col(xCol)).limit(maxChartRows).collect()
            if (agg.length >= 2) {
              val sums = series.indices.map(i =>
                agg.map(r => Option(r.get(i + 1)).map(_.toString.toDouble).getOrElse(0.0)).toArray)
              recs += chartRec("sum_bar", Map("x" -> x, "y" -> y),
                lineScore(sums), maxChartRows, key)
            }
          }
        }
        if (enabledTypes.contains("count_bar")) {
          val agg = ChartAssembly.countBar(x.df, xCol)
            .orderBy(col(xCol)).limit(maxChartRows).collect()
          if (agg.length >= 2) {
            val counts = agg.map(_.getLong(1).toDouble)
            recs += chartRec("count_bar", Map("x" -> x),
              lineScore(Seq(counts)), maxChartRows, key)
          }
        }
      }
    }

    // ── sort, dedup, top-k per FAMILY buffer (search.py:1261-1299):
    //    the reference pools num+cat scatter into ONE "scatter" buffer
    //    (and ord+rel lines into "line", the cat-line kinds into
    //    "cat_line") before capping, so e.g. MAXSCATTER=10 bounds ALL
    //    scatters combined, not 10 of each kind. Slice after dedup =
    //    min(int(len·RECOMMENDPCT)+1, familyCap) (search.py:1274-1278).
    val family = Map("num_scatter" -> "scatter", "cat_scatter" -> "scatter",
      "ord_line" -> "line", "rel_line" -> "line",
      "ord_cat_line" -> "cat_line", "rel_cat_line" -> "cat_line",
      "sum_bar" -> "sum_bar", "count_bar" -> "count_bar")
    val famCaps = Map("scatter" -> cfg.maxScatter, "line" -> cfg.maxLine,
      "cat_line" -> cfg.maxCatLine, "sum_bar" -> cfg.maxSumBar,
      "count_bar" -> cfg.maxCountBar)
    val seen = mutable.Set[String]()
    val topk = recs.toSeq.groupBy(c => family.getOrElse(c.chartType, c.chartType))
      .toSeq.sortBy(_._1).flatMap { case (fam, group) =>
        // first-wins on the coarse dedupKey (higher score survives —
        // the buffer is sorted before removal, search.py:1267-1272)
        val deduped = group.sortBy(-_.score).filter(r => seen.add(r.dedupKey))
        deduped.take(math.min((deduped.size * cfg.recommendPct).toInt + 1,
          famCaps.getOrElse(fam, 3)))
      }

    Recommendation(topk, ProvenanceGraph.render(topk))
    } finally {
      // always release resources — a failed assembly must not leak the
      // persisted source frame or the executor pool
      execPool.shutdown()
      df.unpersist()
    }
  }

  private def chartRec(chartType: String, chans: Map[String, Executed],
                       score: Double, maxRows: Int, key: Seq[String]): ChartRec = {
    val channels = chans.map { case (ch, ex) => ch -> s"${ex.coreT} | ${ex.tpath.fingerprint}" }
    val columns = chans.map { case (ch, ex) => ch -> ex.outCols }
    val sig = chartType + "::" + chans.toSeq.sortBy(_._1)
      .map { case (ch, ex) => s"$ch=${ex.coreT}:${ex.tpath.fingerprint}" }.mkString("|")
    // the reference's duplicate-removal key: op names only, per channel
    // (search.py:1286-1290 joins t["t"]/t["name"], never the columns)
    val dedupKey = chartType + "::" + chans.toSeq.sortBy(_._1)
      .map { case (ch, ex) =>
        s"$ch=${(ex.tpath.steps.map(_.op) :+ ex.coreT).mkString(" ")}"
      }.mkString("|")
    // data = the JOINED all-channels frame (key + every channel's
    // output columns, right-side collisions renamed `__y` like
    // Engine.buildChart), capped at maxRows — previously this was 20
    // raw rows of the FIRST channel only (no y values for a bar/line
    // chart) and the maxRows argument was dead, so ChartRec.data
    // could not render the chart it described
    val chanSeq = chans.toSeq
    val (joined, dataCols) = chanSeq.tail.foldLeft(
        (chanSeq.head._2.df, chanSeq.head._2.outCols)) { case ((l, acc), (_, ex)) =>
      val (j, rc) = joinOnKey(key)(l, ex.df, ex.outCols)
      (j, acc ++ rc)
    }
    val sample = joined
      .select((key ++ dataCols).distinct.map(org.apache.spark.sql.functions.col): _*)
      .limit(maxRows).collect().map { r =>
        r.schema.fieldNames.zip(r.toSeq).toMap
      }.toSeq
    ChartRec(chartType, channels, columns, score, sig, dedupKey, sample)
  }
}

/** Provenance graph emission (search.py:1301-1443): nodes = source /
  * transforms / charts, edges = derivation, vis_list = the charts.
  * JSON replaces the reference's eval-able node-id strings with
  * content fingerprints (SURVEY §7.4.5). */
object ProvenanceGraph {
  private def esc(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  } + "\""

  def render(charts: Seq[ChartRec]): String = {
    val nodes = mutable.LinkedHashMap[String, String]() // id → json
    val edges = mutable.ArrayBuffer[String]()
    nodes("source") = s"""{"id":"source","kind":"table"}"""
    charts.zipWithIndex.foreach { case (c, i) =>
      val chartId = s"chart_$i"
      c.channels.toSeq.sortBy(_._1).foreach { case (ch, t) =>
        val tid = "t_" + Integer.toHexString(t.hashCode)
        nodes.getOrElseUpdate(tid,
          s"""{"id":${esc(tid)},"kind":"transform","label":${esc(t)}}""")
        edges += s"""{"from":"source","to":${esc(tid)}}"""
        edges += s"""{"from":${esc(tid)},"to":${esc(chartId)},"channel":${esc(ch)}}"""
      }
      nodes(chartId) =
        s"""{"id":${esc(chartId)},"kind":"chart","type":${esc(c.chartType)},"score":${c.score}}"""
    }
    val vis = charts.map(c =>
      s"""{"chart_type":${esc(c.chartType)},"score":${c.score},"channels":{${
        c.channels.toSeq.sortBy(_._1).map { case (k, v) => s"${esc(k)}:${esc(v)}" }.mkString(",")
      }}}""").mkString("[", ",", "]")
    s"""{"nodes":[${nodes.values.mkString(",")}],"edges":[${edges.mkString(",")}],"vis_list":$vis}"""
  }
}
