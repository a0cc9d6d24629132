package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{CorpusPipeline, Dedup}
import graft.sources.Tables

/** Sub-stage timing of CorpusPipeline.clean at gate config — where do
  * 290 s go on 1000 docs? Usage: runMain graft.tools.CleanProbe [sfDir]
  */
object CleanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val ID_OFFSET = 10000000L
    val d = Tables.documentsSpread(spark, dir).select(col("doc_id").as("id"), col("text"))
    val truncated = d.select((col("id") + ID_OFFSET).as("id"),
      array_join(slice(TextFunctions.tokens(col("text")), lit(1),
        greatest((size(TextFunctions.tokens(col("text"))) * 4) / 5, lit(1)).cast("int")), " ").as("text"))
    val corpus = d.unionByName(truncated)
    time("corpus count")(corpus.count())

    val exact = time("exactDedup ctor")(Dedup.exactDedup(corpus, "id", "text"))
    time("exactDedup count")(exact.count())

    // gates is private; replicate its expressions
    val filtered = time("gates ctor") {
      exact.withColumn("__toks", TextFunctions.tokens(col("text")))
        .withColumn("__ltoks", TextFunctions.tokens(lower(col("text"))))
        .withColumn("quality",
          TextFunctions.qualityScoreOf(col("text"), col("__toks"), col("__ltoks")))
        .withColumn("lang", TextFunctions.langIdOf(col("text"), col("__ltoks")))
        .drop("__toks", "__ltoks")
        .where(col("quality") >= 0.3)
    }
    time("gates count")(filtered.count())

    val sigs = time("sigs ctor")(
      Dedup.minhashSignatures(filtered, "id", "text", 32, 3))
    time("sigs count")(sigs.count())

    val pairs = time("pairs ctor")(
      Dedup.minhashCandidatePairs(sigs, 32, 8, 0.5))
    time("pairs count")(pairs.count())

    val surv = time("survivors (eager loop)")(Dedup.nearDupSurvivors(pairs))
    time("survivors count")(surv.count())

    val cleaned = time("anti-join ctor")(Dedup.nearDedup(filtered, pairs, "id"))
    time("anti-join count")(cleaned.count())
    spark.stop()
  }
}
