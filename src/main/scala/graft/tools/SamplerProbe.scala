package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.PipelineOps

/** Scale probe for the mixture samplers' rank machinery: one domain
  * holds 90% of a 10M-row corpus, and the per-domain rank is computed
  * either by the shipped zipWithIndex-minus-offset path (range
  * partition over (domain, md5, id) — the skew spreads across the
  * hash) or by the naive `ROW_NUMBER over (PARTITION BY domain)`
  * window, which funnels the 9M-row head domain through ONE window
  * partition. Dev evidence for the temperatureSample scaladoc, not a
  * gate surface.
  *
  * Usage: sbt "runMain graft.tools.SamplerProbe [rows] [naive]"
  */
object SamplerProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val naive = args.lift(1).contains("naive")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(rows).select(col("id"),
      when(col("id") % 10 < 9, lit("head"))
        .otherwise(concat(lit("tail"), col("id") % 7)).as("source"))
    val n = rows / 10
    val t0 = System.nanoTime()
    val sampled =
      if (naive) {
        import org.apache.spark.sql.expressions.Window
        // proportional targets are enough for the probe: the cost under
        // measurement is the rank, not the budget arithmetic
        val w = Window.partitionBy(col("source"))
          .orderBy(md5(concat(col("id").cast("string"), lit(":graft-temp"))), col("id"))
        df.withColumn("domain_rank", row_number().over(w))
          .where(col("domain_rank") <= n / 8)
      } else PipelineOps.temperatureSample(df, "id", "source", n)
    val cnt = sampled.count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[sampler] rows=$rows%d mode=${if (naive) "domain-window" else "zipWithIndex"}%s " +
      f"wall=$dt%.1fs sampled=$cnt%d")
    graft.CacheScope.releaseAll()
    spark.stop()
  }
}
