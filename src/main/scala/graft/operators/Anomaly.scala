package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly detection over a keyed event stream — each
  * event scored against the trailing `windowN`-event window of its
  * key (the ops-metrics staple: error-rate spikes, latency
  * regressions, volume anomalies on a per-type basis).
  *
  * Exactness design (what makes this hash-gateable): windowed moment
  * sums over DOUBLES are engine-divergent by construction — Spark's
  * sliding frames accumulate linearly while DuckDB aggregates windows
  * through segment trees, so the same frame sums in different orders
  * and drifts in the last ulp. Values are therefore QUANTIZED to
  * 2^-10 units first (`floor(x·1024)` — the [[CoreT.PinScale]] idea at
  * window scale), and both window moments (Σv, Σv²) are LONG sums —
  * exact under any summation order. The z arithmetic then runs
  * per-row on bit-identical inputs, and every intermediate stays
  * under 2^53 so even the double casts are exact: the per-value bound
  * scales with the window — |v| ≤ floor(√(2^52/windowN)) keeps
  * Σv² ≤ 2^52 (and Σv far below 2^53) at ANY admitted window size, so
  * a 24-event window admits |x| up to ~13k while the 4096 cap still
  * admits ~1k (both bounds asserted, loudly).
  * The quantization changes a z-score by O(2^-10/σ) — irrelevant to a
  * |z| > 3 flag; the DETERMINISM is what's bought.
  *
  * Scale shape: ONE hash shuffle on the key; the window is
  * rows-bounded (no unbounded-preceding state), frames sort
  * in-partition on (ts, id) — spillable, no single-partition global
  * window (the [[Rank]] hazard this repo routes around everywhere);
  * warm-up rows (fewer than `windowN` predecessors) emit no score.
  * Rows with a NULL value are dropped BEFORE the window — they
  * neither score nor occupy a window slot (without the filter a null
  * would count toward `__n` while contributing nothing to the moment
  * sums, quietly deflating its neighbors' z — the round-12 verdict
  * finding). The DuckDB oracle mirrors the filter textually.
  * The current row is INCLUDED in its own window (mean/σ of the
  * trailing context including self — the plain rolling convention;
  * self-exclusion is one frame shift away).
  *
  * @return input key/id/ts/value plus (zq, is_anomaly) —
  *         zq the quantized-input z-score, is_anomaly = |zq| > thresh
  *         (0 when the window variance is zero) */
object Anomaly {

  private val Q = 1024.0 // 2^10 quantization

  def rollingZScores(events: DataFrame, keyCol: String, tsCol: String,
                     idCol: String, valCol: String, windowN: Int = 24,
                     thresh: Double = 3.0): DataFrame = {
    require(windowN >= 2 && windowN <= 4096,
      s"windowN in [2, 4096] (the exactness bound), got $windowN")
    // |v| ≤ √(2^52/windowN) keeps v² free of long overflow and
    // Σv² ≤ 2^52 over the window (exact even as a double) — enforced
    // AT QUANTIZATION, per row, loudly
    val vMax = math.sqrt(4503599627370496.0 / windowN).toLong // 2^52/N
    val v0 = floor(col(valCol) * lit(Q)).cast("long")
    val v = when(abs(v0) <= lit(vMax), v0)
      .otherwise(raise_error(lit(
        "rollingZScores: |value|·1024 exceeds the exactness bound — scale the column down"))
        .cast("long"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(windowN - 1), 0)
    val nD = lit(windowN.toDouble)
    val guarded = events
      .where(col(valCol).isNotNull) // nulls neither score nor count as context
      .withColumn("__v", v)
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(col("__v")).over(w))
      .withColumn("__q", sum(col("__v") * col("__v")).over(w))
      .where(col("__n") === windowN)
    val sD = col("__s").cast("double")
    val qD = col("__q").cast("double")
    val vD = col("__v").cast("double")
    val varNum = qD - (sD * sD) / nD
    val z = (vD - sD / nD) / sqrt(varNum / nD)
    guarded
      .withColumn("zq", when(varNum <= 0.0, lit(0.0)).otherwise(z))
      .withColumn("is_anomaly",
        when(abs(col("zq")) > lit(thresh), 1L).otherwise(0L))
      .drop("__v", "__n", "__s", "__q")
  }
}
