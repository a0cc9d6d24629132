package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-phase aggregation.
  *
  * A single hot group key funnels its whole group through one reducer;
  * salting splits every group into `buckets` sub-groups for the first
  * (map-heavy) aggregation, then combines the partials in a second,
  * tiny aggregation. Correct for algebraic aggregates (sum/count/min/
  * max — anything with an associative partial form).
  *
  * AQE's skew-join handling covers joins; this is the groupBy-side
  * counterpart for when a key's row count, not a partition's size,
  * is the bottleneck.
  */
object Salt {

  /** Salted sum/count per key. Exact-decimal sums keep the result
    * independent of how rows land in salt buckets.
    *
    * CONTRACT: values are summed as `decimal(18, scale)` — exact and
    * bucket-order-free for inputs with at most `scale` decimal places
    * and |value| < 10^(18−scale) (the gate's money-like columns at the
    * default scale = 2). Finer fractions QUANTIZE to `scale` places
    * before summing, and an overflowing cast nulls the value out of
    * the sum — this is NOT a drop-in exact sum for arbitrary doubles.
    * For full-range doubles with order-free exactness use the 2⁻⁴⁰
    * pinned split ([[CoreT.pinnedParts]]) instead; a plain double
    * `sum` is also already partial-aggregated by Spark and only loses
    * bucket-order reproducibility, not magnitude. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     buckets: Int = 16, scale: Int = 2): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(scale >= 0 && scale <= 17, s"scale must be in [0, 17], got $scale")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol).cast(s"decimal(18,$scale)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).cast("double").as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }
}
