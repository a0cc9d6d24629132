package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesSketch

/** Exact ε-heavy hitters over an unbounded-cardinality column: every
  * value with frequency strictly above n/k, with its EXACT count —
  * the hot-token / hot-domain / hot-URL profile a curation pipeline
  * wants without ever shuffling the full vocabulary (the seam in
  * [[PipelineOps.vocabProfile]], whose groupBy ships every distinct
  * value: fine for tf/df profiling, wrong when the vocabulary itself
  * is corpus-sized — URLs, user-ids, n-grams).
  *
  * Two passes, both bounded:
  *   1. sketch pass — one scan aggregating a [[MisraGriesSketch]]
  *      (fixed k-entry state per partition, map-side combinable) plus
  *      the total count; ≤ k candidate strings reach the driver. The
  *      MG guarantee makes this candidate set COMPLETE: undercount is
  *      at most n/(k+1), so nothing above n/k can be evicted.
  *   2. confirm pass — re-scan filtered to the ≤ k candidates (an
  *      `isin` literal list: pushes into the parquet scan as an IN
  *      filter), exact groupBy over ≤ k distinct values, keep
  *      cnt·k > n.
  *
  * The output is therefore EXACT and partitioning-invariant — sketch
  * counter values are order-dependent (every MG sketch's are), but
  * they are never exposed; only candidate membership is used, and the
  * spec pins output equality across repartitionings. DuckDB oracle is
  * a plain GROUP BY ... HAVING cnt*k > n.
  *
  * @return (value, cnt, total) — one row per heavy hitter
  */
object HeavyHitters {

  def frequentValues(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val vals = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("value"))
    val row = vals.agg(
      MisraGriesSketch.candidates(col("value"), k).as("cands"),
      count(lit(1)).as("n")).head()
    val cands = row.getSeq[String](0)
    val n = row.getLong(1)
    if (cands.isEmpty)
      return vals.limit(0)
        .withColumn("cnt", lit(0L)).withColumn("total", lit(n))
    vals.where(col("value").isin(cands: _*))
      .groupBy(col("value"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(k.toLong) > lit(n))
      .withColumn("total", lit(n))
  }

  /** Token-level convenience: heavy hitters over whitespace tokens of
    * `textCol` (hot vocabulary without a full-vocab shuffle). */
  def frequentTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    frequentValues(
      df.select(explode(graft.functions.TextFunctions.tokens(
        coalesce(col(textCol), lit("")))).as("__tok")),
      "__tok", k)
}
