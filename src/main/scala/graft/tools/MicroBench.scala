package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sources.Tables

/** Scratch micro-bench for expression-shape experiments (not part of
  * the driver contract). Usage: runMain graft.tools.MicroBench */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1").cache()
    docs.count()

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    for (_ <- 1 to 2) {
      time("quality_direct") {
        docs.select(col("doc_id"),
          TextFunctions.alphaRatio(col("text")).as("alpha_ratio"),
          TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"),
          TextFunctions.meanTokenLen(col("text")).as("mean_token_len"),
          TextFunctions.qualityScore(col("text")).as("quality"))
          .write.format("noop").mode("overwrite").save()
      }
      time("quality_projected") {
        docs.select(col("doc_id"), col("text"),
          TextFunctions.tokens(col("text")).as("__toks"),
          TextFunctions.tokens(lower(col("text"))).as("__ltoks"))
          .select(col("doc_id"),
            TextFunctions.alphaRatio(col("text")).as("alpha_ratio"),
            TextFunctions.stopwordRatioOf(col("__ltoks")).as("stopword_ratio"),
            TextFunctions.meanTokenLenOf(col("__toks")).as("mean_token_len"),
            TextFunctions.qualityScoreOf(col("text"), col("__toks"), col("__ltoks")).as("quality"))
          .write.format("noop").mode("overwrite").save()
      }
      time("quality_twolevel") {
        val l1 = docs.select(col("doc_id"), col("text"),
          TextFunctions.alphaRatio(col("text")).as("alpha_ratio"),
          TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"),
          TextFunctions.meanTokenLen(col("text")).as("mean_token_len"),
          TextFunctions.digitRatio(col("text")).as("__digit"))
        val lenOk = when(length(col("text")).between(50, 10000), 1.0).otherwise(0.0)
        val meanOk = when(coalesce(col("mean_token_len"), lit(0.0)).between(3.0, 12.0), 1.0).otherwise(0.0)
        l1.select(col("doc_id"), col("alpha_ratio"), col("stopword_ratio"), col("mean_token_len"),
          ((lenOk * 0.2) + (meanOk * 0.2) + (coalesce(col("alpha_ratio"), lit(0.0)) * 0.3) +
            (least(coalesce(col("stopword_ratio"), lit(0.0)) * 5.0, lit(1.0)) * 0.2) +
            ((lit(1.0) - coalesce(col("__digit"), lit(0.0))) * 0.1)).as("quality"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
