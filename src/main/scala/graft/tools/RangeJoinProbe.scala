package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Scale probe for the binned point-in-interval join: 2M points × 200k
  * intervals over 1k keys (≈1000× the gate fixture's pair volume),
  * binned vs the naive `BETWEEN` join Spark plans as a per-key
  * cartesian filter. Run with `naive` as the second arg to watch the
  * nested-loop spelling fall over the same data. Dev evidence, not a
  * gate surface.
  *
  * The interesting axis is KEY CARDINALITY: the naive plan's cost is
  * Σ_key points(key)·intervals(key), so at 1000 well-spread keys it
  * keeps up, but at 10 keys (hot-key telemetry, a sharded tenant) the
  * per-key product explodes 100× while the binned cost — matches +
  * replication — doesn't move. Pass `keys` as the third arg.
  *
  * Usage: sbt "runMain graft.tools.RangeJoinProbe [points] [naive] [keys]"
  */
object RangeJoinProbe {
  def main(args: Array[String]): Unit = {
    val nPoints = args.headOption.map(_.toLong).getOrElse(2000000L)
    val naive = args.lift(1).contains("naive")
    val nKeys = args.lift(2).map(_.toLong).getOrElse(1000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nIv = nPoints / 10
    val keys = nKeys
    val span = 86400L * 30 // a month of seconds
    // deterministic scatter (multiplicative hash), ~6 points per
    // interval on average at width 2h
    val points = spark.range(nPoints).select(col("id").as("pid"),
      (col("id") % keys).as("key"), (col("id") * 2654435761L % span).as("t"))
    val ivs = spark.range(nIv).select(col("id").as("iid"),
      (col("id") % keys).as("key"), (col("id") * 40503L % span).as("s"))
      .withColumn("e", col("s") + 7200L)
    val t0 = System.nanoTime()
    val joined =
      if (naive) points.join(ivs.withColumnRenamed("key", "k2"),
        points("key") === col("k2") && points("t") >= col("s") && points("t") <= col("e"))
      else RangeJoin.pointInInterval(points, ivs, Seq("key"), "t", "s", "e",
        binWidth = 7200L)
    val n = joined.count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[range-join] points=$nPoints%d intervals=$nIv%d keys=$keys%d " +
      f"mode=${if (naive) "naive-between" else "binned"}%s wall=$dt%.1fs pairs=$n%d")
    spark.stop()
  }
}
