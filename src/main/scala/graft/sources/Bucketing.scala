package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed persistence for co-located joins.
  *
  * Big fact-fact joins shuffle both sides on the join key every query;
  * bucketing pays that shuffle ONCE at write time — both tables
  * hash-partitioned into the same bucket count on the key — and every
  * subsequent equi-join on that key plans with no Exchange on either
  * side (verified in BucketingSpec). This is the table-layout half of
  * the 100 TB join story; AQE + broadcast cover the small-side half.
  */
object Bucketing {

  /** Persist a frame bucketed (and sorted) by `keyCol` as a managed
    * table. Readers get bucket-aware scans automatically. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    numBuckets: Int = 32): Unit =
    df.write
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
