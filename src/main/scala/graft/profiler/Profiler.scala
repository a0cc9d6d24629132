package graft.profiler

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{ColumnProfile, EngineConfig, LogicalType, TableProfile}
import graft.functions.{DBSCAN, DateSniffer}
import graft.operators.Rank

/** Table profiler — the Spark port of the reference's `parsedata`
  * (spreadsheet.py:46-282).
  *
  * One distributed agg pass collects every per-column stat (count,
  * exact distinct for key detection, nulls, min/max, a sampled value
  * for date sniffing); one `approxQuantile` pass collects K-bucket
  * quantile signatures for the numeric columns. Everything downstream
  * — type rules, key precedence, Wasserstein distances, DBSCAN column
  * clustering, name clustering — is driver-side math over column-level
  * facts, which stays O(#columns), independent of row count. That is
  * the 100 TB path: the data is touched by exactly two scans.
  */
object Profiler {

  /** Inferred per-column facts from the single agg pass. */
  private final case class RawStats(
      name: String, dt: DataType, distinct: Long, nulls: Long,
      min: Option[Double], max: Option[Double], sample: Option[String])

  /** Profile a table. Returns the (possibly augmented) DataFrame — a
    * synthetic `defaultindex` key column is appended when no natural
    * key exists (spreadsheet.py:168-177) — plus the TableProfile.
    */
  /** Column reference by LITERAL name: bare `col(name)` parses dots as
    * nested-field access, so a table with a column literally named
    * "No." or "price.usd" (dotted names are anticipated —
    * cfg.potentialIdx contains "no.") would abort the whole profile
    * with an AnalysisException. Backtick-quoting (with doubling for
    * embedded backticks) resolves the flat name; identical to col()
    * for plain names. */
  private def quotedSql(name: String): String =
    "`" + name.replace("`", "``") + "`"
  private def qcol(name: String): Column = col(quotedSql(name))

  /** The approx-distinct routing decision, factored out so the spec
    * can probe it against stat-less sources directly. True when the
    * flag forces it, or when Catalyst's size estimate is both KNOWN
    * and above the configured threshold.
    *
    * "Known" is decided at the LEAVES, not the top of the plan: a
    * stat-less leaf (LogicalRDD, many V2 relations) reports the
    * spark.sql.defaultSizeInBytes placeholder, but Catalyst SCALES
    * that placeholder through projections/filters/limits (column-size
    * and selectivity ratios), so a top-of-plan estimate below the
    * sentinel can still be placeholder-derived fiction — a 100-row
    * RDD-backed frame with any projection would read as known-huge
    * and silently route to HLL, violating the stat-less-stays-exact
    * invariant. Any leaf at-or-past the sentinel (or with no row
    * count either) means UNKNOWN; unknown keeps the exact path
    * (slow-but-correct is the right failure direction for a size the
    * planner cannot see). */
  private[graft] def shouldApproxDistinct(df: DataFrame, cfg: EngineConfig): Boolean = {
    val plan = df.queryExecution.optimizedPlan
    val unknownSentinel = BigInt(scala.util.Try(
      df.sparkSession.conf.get("spark.sql.defaultSizeInBytes").toLong)
      .getOrElse(Long.MaxValue))
    val anyStatlessLeaf = plan.collectLeaves().exists { leaf =>
      val s = leaf.stats
      s.sizeInBytes >= unknownSentinel ||
        (s.sizeInBytes == 0 && s.rowCount.isEmpty && leaf.output.nonEmpty)
    }
    cfg.approxDistinct ||
      (!anyStatlessLeaf &&
        plan.stats.sizeInBytes > BigInt(cfg.approxDistinctAboveBytes))
  }

  def profile(df0: DataFrame, cfg: EngineConfig = EngineConfig.default): (DataFrame, TableProfile) = {
    val df = cfg.maxSourceRows.fold(df0)(df0.limit)
    val fields = df.schema.fields.toSeq

    // scale auto-route: the exact multi-column countDistinct below is
    // an expand-based plan (scan × #columns) — fine at fixture scale,
    // catastrophic on a large ingest. When Catalyst's size estimate
    // says the input is big, take the HLL + boundary-re-count path
    // regardless of the flag; decisions stay exact either way.
    // Stat-LESS sources (LogicalRDD, many V2 relations) report
    // spark.sql.defaultSizeInBytes = Long.MaxValue as a conservative
    // placeholder, and joins multiply it further — an estimate at or
    // past that sentinel means UNKNOWN, not huge, so it must not flip
    // a 100-row RDD-backed frame onto HLL counts. Unknown keeps the
    // exact path (slow-but-correct is the right failure direction for
    // a size the planner cannot see).
    val useApprox = shouldApproxDistinct(df, cfg)

    // ── pass 1: one agg over everything. At scale (cfg.approxDistinct)
    //    distinct counts use HLL sketches; exact multi-column
    //    countDistinct is an expand-based plan that multiplies the scan
    //    by #columns — the approx pass keeps it one linear scan ──────
    val aggs: Seq[Column] = count(lit(1)).as("__rows") +: fields.flatMap { f =>
      val c = qcol(f.name)
      val numish = f.dataType match {
        case _: NumericType => Some(c.cast(DoubleType))
        case DateType       => Some(datediff(c, lit("1970-01-01")).cast(DoubleType))
        case TimestampType  => Some(unix_timestamp(c).cast(DoubleType))
        // NTZ wall-clock → epoch seconds via TZ-FREE arithmetic (the
        // eventsRawNanos precedent): casting through TimestampType
        // would shift the stats by the caller session's timezone
        case TimestampNTZType => Some(expr(
          s"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ${quotedSql(f.name)})")
          .cast(DoubleType))
        case _              => None
      }
      val nd = if (useApprox) approx_count_distinct(c, 0.01) else countDistinct(c)
      Seq(
        nd.as(s"__nd_${f.name}"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__nn_${f.name}"),
        numish.map(n => min(n)).getOrElse(lit(null).cast(DoubleType)).as(s"__min_${f.name}"),
        numish.map(n => max(n)).getOrElse(lit(null).cast(DoubleType)).as(s"__max_${f.name}"),
        first(c.cast(StringType), ignoreNulls = true).as(s"__fv_${f.name}"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getAs[Long]("__rows")

    // pass 1b (approx mode only): exact re-count for columns whose
    // approximate count is near a decision boundary — key detection
    // (distinct == rows) or the nominal threshold (distinct ≤ 5%·rows).
    // Typically a handful of columns, one cheap agg.
    val exactNd: Map[String, Long] =
      if (!useApprox || rows == 0) Map.empty
      else {
        val boundary = fields.filter { f =>
          val approx = row.getAs[Long](s"__nd_${f.name}")
          val nearKey = approx >= rows * 0.95
          val nomThresh = rows * cfg.nominalStd
          val nearNominal = approx >= nomThresh * 0.8 && approx <= nomThresh * 1.2
          nearKey || nearNominal
        }
        if (boundary.isEmpty) Map.empty
        else {
          val exactAggs = boundary.map(f => countDistinct(qcol(f.name)).as(s"__xnd_${f.name}"))
          val r2 = df.agg(exactAggs.head, exactAggs.tail: _*).head()
          boundary.map(f => f.name -> r2.getAs[Long](s"__xnd_${f.name}")).toMap
        }
      }

    val raw = fields.map { f =>
      def opt(prefix: String): Option[Double] =
        Option(row.getAs[Any](s"${prefix}_${f.name}")).map(_.asInstanceOf[Double])
      RawStats(f.name, f.dataType,
        exactNd.getOrElse(f.name, row.getAs[Long](s"__nd_${f.name}")),
        row.getAs[Long](s"__nn_${f.name}"),
        opt("__min"), opt("__max"),
        Option(row.getAs[String](s"__fv_${f.name}")))
    }

    // ── type + key rules in column order (spreadsheet.py:60-166) ─────
    // mutable view mirroring the reference's in-place demotion logic
    final case class St(var ltype: LogicalType, var isKey: Boolean)
    val st = scala.collection.mutable.LinkedHashMap[String, St]()
    var key: Option[String] = None
    def keyType: Option[LogicalType] = key.map(st(_).ltype)

    raw.foreach { r =>
      val family = LogicalType.fromSpark(r.dt)
      family match {
        case LogicalType.Str =>
          if (r.sample.exists(DateSniffer.isDate) && r.dt == StringType)
            st(r.name) = St(LogicalType.Date, isKey = false)
          else {
            val s = St(LogicalType.Str, isKey = false)
            st(r.name) = s
            if (r.distinct == rows && rows > 0) {
              if (!keyType.contains(LogicalType.Str)) {
                key.foreach { k =>
                  st(k).isKey = false
                  if (st(k).ltype == LogicalType.Nominal) st(k).ltype = LogicalType.Int
                }
                s.isKey = true; key = Some(r.name)
              }
            } else if (r.distinct <= rows * cfg.nominalStd)
              s.ltype = LogicalType.Nominal
          }
        case LogicalType.Int =>
          val s = St(LogicalType.Int, isKey = false)
          st(r.name) = s
          if (r.distinct == rows && rows > 0 &&
              !keyType.exists(t => t == LogicalType.Str || t == LogicalType.Int || t == LogicalType.Nominal)) {
            key.foreach(k => st(k).isKey = false)
            s.isKey = true; key = Some(r.name)
          }
          if (r.distinct <= rows * cfg.nominalStd || s.isKey)
            s.ltype = LogicalType.Nominal
        case LogicalType.Real =>
          val s = St(LogicalType.Real, isKey = false)
          st(r.name) = s
          if (cfg.floatCanBeKey && r.distinct == rows && rows > 0 &&
              !keyType.exists(t => t == LogicalType.Str || t == LogicalType.Int || t == LogicalType.Real)) {
            key.foreach(k => st(k).isKey = false)
            s.isKey = true; key = Some(r.name)
          }
          if (r.distinct <= rows * cfg.nominalStd || s.isKey)
            s.ltype = LogicalType.Nominal
        case _ =>
          st(r.name) = St(LogicalType.Date, isKey = false)
      }
    }

    // synthetic key when none inferred (spreadsheet.py:168-177);
    // zipWithIndex keeps assignment distributed + deterministic for a
    // fixed file layout (no Window single-partition funnel)
    var out = df
    if (key.isEmpty) {
      out = appendDefaultIndex(df)
      st("defaultindex") = St(LogicalType.Nominal, isKey = true)
      key = Some("defaultindex")
    }

    val numericCols = raw.filter(r => st(r.name).ltype == LogicalType.Int || st(r.name).ltype == LogicalType.Real)
      .map(_.name)

    // ── pass 2: quantile signatures for numeric cols ─────────────────
    val probs = (0 until cfg.quantileBuckets)
      .map(i => i.toDouble / (cfg.quantileBuckets - 1)).toArray
    val quantiles: Map[String, Array[Double]] =
      if (numericCols.isEmpty || rows == 0) Map.empty
      else {
        // sanitized aliases: the GK agg resolves its column names
        // through the same dot-ambiguous path as col(). One
        // declarative percentile_approx pass over ALL columns
        // (SketchProfile.quantileSignatures, accuracy 1000 = the
        // former stat.approxQuantile relativeError 0.001) — same GK
        // summaries, but inside codegen'd aggregation instead of an
        // opaque RDD aggregate.
        val safe = numericCols.zipWithIndex.map { case (c, i) => c -> s"__q$i" }.toMap
        val casted = out.select(numericCols.map(c => qcol(c).cast(DoubleType).as(safe(c))): _*)
        val sigs = graft.operators.SketchProfile.quantileSignatures(
          casted, numericCols.map(safe), probs.toSeq)
        numericCols.map(c => c -> sigs(safe(c))).toMap
      }

    // Wasserstein-1 via quantile signatures: W1(A,B) = ∫|F_A⁻¹-F_B⁻¹|
    // ≈ mean |q_i^A − q_i^B| (spreadsheet.py:187-190, utils.py:137-163
    // compute this exactly on raw values; the sketch form is the
    // scale-safe equivalent)
    def w1(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => math.abs(x - y) }.sum / a.length
    val distMat: Map[(String, String), Double] = (for {
      a <- numericCols; b <- numericCols
    } yield (a, b) -> w1(quantiles(a), quantiles(b))).toMap

    // ── dimension-match clusters: DBSCAN(eps=1, minPts=5, wasserstein)
    //    over columns-as-points (spreadsheet.py:197-213) ──────────────
    val nIdx = numericCols.toArray
    val labels =
      if (nIdx.isEmpty) Array.empty[Int]
      else DBSCAN.fit(nIdx.length, (i, j) => distMat((nIdx(i), nIdx(j))), eps = 1.0, minPts = 5)
    var dimClusters: Seq[Seq[String]] =
      labels.zipWithIndex.filter(_._1 >= 0).groupBy(_._1).toSeq.sortBy(_._1)
        .map(_._2.map(p => nIdx(p._2)).toSeq)
    // the full numeric set is always a cluster (spreadsheet.py:212-213)
    if (!dimClusters.contains(numericCols)) dimClusters = dimClusters :+ numericCols

    // ── unit clusters: shared "(unit)" suffix (spreadsheet.py:217-228) ─
    val names = out.columns.toSeq
    val unitOf: Map[String, String] = names.map { n =>
      n -> (if (n.endsWith(")") && n.contains("(")) n.split('(').last.dropRight(1) else "")
    }.toMap
    val unitClusters = unitOf.values.filter(_.nonEmpty).toSeq.distinct
      .map(u => names.filter(n => unitOf(n) == u))

    // ── semantic name clusters (spreadsheet.py:231-253): w2v DBSCAN
    //    over first-token vectors, feature-flagged like the reference's
    //    optional GoogleNews asset; then name-substring clusters:
    //    ≥2-char token in ≥2 names (spreadsheet.py:256-262). Semantic
    //    clusters come FIRST, matching the reference's append order ──
    val semClusters =
      if (cfg.semanticNameClusters) SemClusters.cluster(names, cfg.semEmbeddingPath)
      else Nil
    val tokens = names.flatMap(n => n.toLowerCase.split("[^a-z0-9]+").filter(_.length >= 2)).distinct
    val nameClusters = semClusters ++ tokens
      .map(t => names.filter(_.toLowerCase.contains(t)))
      .filter(_.size >= 2)

    // ── cluster cleanup (spreadsheet.py:264-282): numeric-only, no
    //    potential-index columns, ≥2 unique members ────────────────────
    def clean(clusters: Seq[Seq[String]]): Seq[Seq[String]] = {
      val numSet = numericCols.toSet
      clusters
        .map(_.filter(c => numSet.contains(c) && !cfg.potentialIdx.contains(c.toLowerCase)))
        .filter(_.size >= 2).distinct
    }

    val profiles = raw.map { r =>
      ColumnProfile(r.name, r.dt.simpleString, st(r.name).ltype, r.distinct, r.nulls,
        r.min, r.max, st(r.name).isKey, quantiles.get(r.name))
    } ++ (if (st.contains("defaultindex") && !raw.exists(_.name == "defaultindex"))
      Seq(ColumnProfile("defaultindex", "bigint", LogicalType.Nominal, rows, 0,
        Some(0.0), Some((rows - 1).toDouble), isKey = true, None))
    else Nil)

    (out, TableProfile(rows, profiles, key, distMat,
      clean(dimClusters ++ unitClusters), clean(unitClusters), clean(nameClusters)))
  }

  /** Append a 0..n-1 `defaultindex` column without a global sort. */
  def appendDefaultIndex(df: DataFrame): DataFrame = {
    val rdd = df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd,
      StructType(df.schema.fields :+ StructField("defaultindex", LongType, nullable = false)))
  }

  /** The per-column stats as a DataFrame — the declared-query surface
    * for the profiling operator (numeric columns only, so min/max stay
    * typed double and SQL-comparable). */
  def profileStatsDF(spark: SparkSession, df: DataFrame, cfg: EngineConfig = EngineConfig.default): DataFrame = {
    val (_, prof) = profile(df, cfg)
    import scala.jdk.CollectionConverters._
    val rows = prof.columns
      .filter(c => c.min.isDefined && (c.sparkType != "date" &&
        c.sparkType != "timestamp" && c.sparkType != "timestamp_ntz"))
      .map(c => Row(c.name, c.logicalType.name, c.distinctCount, c.nullCount,
        c.min.get, c.max.get, c.isKey))
    val schema = StructType(Seq(
      StructField("col_name", StringType), StructField("ltype", StringType),
      StructField("n_distinct", LongType), StructField("n_nulls", LongType),
      StructField("min_val", DoubleType), StructField("max_val", DoubleType),
      StructField("is_key", BooleanType)))
    spark.createDataFrame(rows.asJava, schema)
  }
}
