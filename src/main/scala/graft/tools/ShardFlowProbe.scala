package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{CorpusPipeline, Dedup, PipelineOps}
import graft.sources.Tables

/** Stage-by-stage timing of the q_corpus_to_shards composition — the
  * full Verify gate saw it OOM after 70 queries and take ~7 min alone
  * at sf0.01/local[4] (500 docs!), so something in the composition is
  * pathological. Usage: runMain graft.tools.ShardFlowProbe [sfDir]
  */
object ShardFlowProbe {
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

    val cfg = CorpusPipeline.Config(minQuality = 0.3, tau = 0.5,
      minhashBands = 8, minhashHashes = 32, shingleSize = 3)

    val cleaned = time("clean (count)") {
      val c = CorpusPipeline.clean(corpus, "id", "text", cfg)
      c.count(); c
    }
    val chunks = time("chunk (count)") {
      val ch = PipelineOps.chunkDocuments(cleaned, "id", "text",
          chunkSize = 64, stride = 64)
        .select(concat_ws(":", col("id"), col("chunk_idx")).as("chunk_id"),
          col("n_tokens"))
      ch.count(); ch
    }
    time("shardPack (count)") {
      PipelineOps.shardPack(chunks, "chunk_id", "n_tokens", budget = 512L).count()
    }
    // and the whole thing fused, as the gate runs it (write to noop)
    time("fused write") {
      val cleaned2 = CorpusPipeline.clean(corpus, "id", "text", cfg)
      val chunks2 = PipelineOps.chunkDocuments(cleaned2, "id", "text",
          chunkSize = 64, stride = 64)
        .select(concat_ws(":", col("id"), col("chunk_idx")).as("chunk_id"),
          col("n_tokens"))
      PipelineOps.shardPack(chunks2, "chunk_id", "n_tokens", budget = 512L)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
