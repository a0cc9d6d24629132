package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.PipelineOps

/** Scale probe for the distributed prefix-sum shard packer: packs 10M
  * synthetic rows (20,000× the gate fixture) and prints wall time, the
  * driver-side footprint (one subtotal per partition), and shard-fill
  * statistics. The comparison point is the naive
  * `sum().over(Window.orderBy)` spelling, which collapses the same
  * input to ONE partition — run with `naive` as the second arg to
  * watch the difference. Dev evidence, not a gate surface.
  *
  * Usage: sbt "runMain graft.tools.ShardPackProbe [rows] [naive]"
  */
object ShardPackProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val naive = args.lift(1).contains("naive")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // weights 50..1049, Zipf-free: the probe measures the scan + prefix
    // machinery, not agg skew
    val df = spark.range(rows).select(col("id"),
      (col("id") % 1000 + 50).as("w"))
    val budget = 100000L
    val t0 = System.nanoTime()
    val packed =
      if (naive) {
        import org.apache.spark.sql.expressions.Window
        val k = md5(concat(col("id").cast("string"), lit(":graft-shard")))
        df.withColumn("__before", coalesce(sum(col("w")).over(
            Window.orderBy(k, col("id")).rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .withColumn("shard_id", (col("__before") / budget).cast("long"))
      } else PipelineOps.shardPack(df, "id", "w", budget)
    val stats = packed.groupBy("shard_id").agg(sum("w").as("fill"))
      .agg(count(lit(1)), min("fill"), max("fill")).collect()(0)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[shard-pack] rows=$rows%d mode=${if (naive) "naive-window" else "distributed"}%s " +
      f"wall=$dt%.1fs shards=${stats.getLong(0)}%d " +
      f"fill_min=${stats.getLong(1)}%d fill_max=${stats.getLong(2)}%d")
    graft.CacheScope.releaseAll()
    spark.stop()
  }
}
