package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, Tokenize}

/** DSIR importance weighting — Data Selection via Importance
  * Resampling (Xie et al. 2023): score every raw-corpus document by
  * how much its hashed n-gram profile looks like a TARGET corpus
  * (the "select pretraining data that looks like Wikipedia" signal).
  *
  * Features are unigrams + bigrams hashed into `buckets` slots (the
  * paper's hashed n-gram model); both corpora get add-one-smoothed
  * bucket distributions p_target / p_raw, and a document scores the
  * MEAN importance ratio p_target(b)/p_raw(b) over its gram
  * positions. The paper averages log-ratios; the mean ratio is the
  * same signal monotone in the same direction WITHOUT `log()`, whose
  * rounding differs by ulps across libm implementations — the
  * [[LmScore]] discipline: each ratio is
  * `((c_t+1)·(N_r+B)) / ((N_t+B)·(c_r+1))` — integer-exact operands,
  * one IEEE multiply each side of one IEEE divide, identical on any
  * engine — and the per-document mean uses the 2⁻⁴⁰ pinned integer
  * sum, so the weight is bit-identical under any partitioning.
  *
  * Scale shape: the bucket tables are ≤ `buckets` rows by construction
  * — BROADCAST, never a corpus-side shuffle key. The raw corpus is
  * touched by one gram explode, one broadcast join, and one
  * document-keyed pinned-mean agg; the gram→bucket hash is the
  * [[PipelineOps.stratifiedSample]] md5-hash32 expression (exact in
  * every engine). The bucket-count aggs are map-side combinable; the
  * target corpus is small by contract (a quality probe set).
  *
  * Returns `(idCol, n_grams, dsir_weight)`; gramless documents weigh
  * 0.0. Importance ratios are CLIPPED at 2¹⁶ (the paper clips
  * importance weights for variance control; here the clip also bounds
  * the pinned arithmetic): per-position `hi ≤ 2³⁶`, so the long
  * half-sums are exact to 2²⁷ ≈ 134M gram positions per document,
  * and the per-document reassembly runs in DECIMAL(38,0) — exact
  * integer, like the oracle's HUGEINT sum — before the single
  * correctly-rounded cast to double.
  */
object Dsir {
  private val PinScale = CoreT.PinScale // 2^40, the shared pin

  private def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** (id, bucket) for every unigram+bigram position of every doc. */
  private def docBuckets(df: DataFrame, idCol: String, textCol: String,
                         buckets: Int): DataFrame = {
    val toks = TextFunctions.tokens(coalesce(col(textCol), lit("")))
    df.select(col(idCol),
        explode(concat(toks, Tokenize.wordShingles(toks, 2))).as("__gram"))
      .select(col(idCol), (hash32(col("__gram")) % buckets).as("__b"))
  }

  def dsirWeights(raw: DataFrame, target: DataFrame,
                  idCol: String, textCol: String,
                  buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(!Set("n_grams", "dsir_weight", "__b", "__gram",
      "__cr", "__ct", "__nraw", "__ntgt").contains(idCol),
      s"idCol '$idCol' collides with an internal column name")
    val rawB = graft.CacheScope.track(docBuckets(raw, idCol, textCol, buckets))
    // single consumer now (tgtCnt below) — no persist needed; the
    // target gram explode runs once, inside the tgtCnt build
    val tgtB = docBuckets(target, idCol, textCol, buckets)

    // the bucket-count frames are ≤ `buckets` rows and consumed twice
    // each (the broadcast probe join + their own total), so they are
    // the scoped persists; the gram totals nRaw/nTgt are the SUMS of
    // these counts, read off the tiny cached frames — the former
    // count() actions were two extra gram-frame passes (corpus-scale
    // on the raw side). They stay driver-read LITERALS in the ratio:
    // a broadcast 1-row cross-join spelling was measured SLOWER
    // (round 15) — the nested-loop join rides every gram position.
    val rawCnt = graft.CacheScope.track(
      rawB.groupBy(col("__b")).agg(count(lit(1)).as("__cr")))
    val tgtCnt = graft.CacheScope.track(
      tgtB.groupBy(col("__b")).agg(count(lit(1)).as("__ct")))
    def totalOf(cnt: DataFrame, c: String): Long =
      cnt.agg(sum(col(c))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    val nRaw = totalOf(rawCnt, "__cr")
    val nTgt = totalOf(tgtCnt, "__ct")

    // importance ratio per position: integer-exact operands, one
    // multiply each side, one divide, then the 2^16 clip — replayed
    // verbatim by the oracle
    val ratio = least(
      ((coalesce(col("__ct"), lit(0L)) + 1).cast("double") *
        lit((nRaw + buckets).toDouble)) /
      (lit((nTgt + buckets).toDouble) *
        (coalesce(col("__cr"), lit(0L)) + 1).cast("double")),
      lit(65536.0))
    val (hi, lo) = CoreT.pinnedSplit(ratio)
    val perDoc = rawB
      .join(broadcast(tgtCnt), Seq("__b"), "left")
      .join(broadcast(rawCnt), Seq("__b"), "left")
      .select(col(idCol), hi.as("__hi"), lo.as("__lo"))
      .groupBy(col(idCol))
      .agg(sum(col("__hi")).as("__shi"), sum(col("__lo")).as("__slo"),
        count(lit(1)).as("__n"))
      .select(col(idCol),
        col("__n").as("n_grams"),
        // exact integer reassembly in DECIMAL(38,0) — a Long multiply
        // here would wrap for huge in-domain documents; the decimal
        // total casts to double correctly rounded, exactly like the
        // oracle's HUGEINT → DOUBLE
        ((col("__shi").cast("decimal(38,0)") * lit(1048576L) + col("__slo"))
          .cast("double") /
          lit(PinScale) / col("__n")).as("dsir_weight"))
    raw.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dsir_weight"), lit(0.0)).as("dsir_weight"))
  }
}
