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
    * independent of how rows land in salt buckets. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).cast("double").as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }
}
