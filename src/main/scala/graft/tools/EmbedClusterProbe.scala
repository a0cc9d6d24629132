package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Time breakdown for q_embed_cluster (fit vs plan vs execute): the
  * bench-heaviest headline query runs on only 2000 sf0.1 embeddings, so
  * wall time is dominated by fixed driver-side costs, not data. Dev
  * evidence, not a gate surface.
  *
  * Usage: sbt "runMain graft.tools.EmbedClusterProbe"
  */
object EmbedClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()

    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = Similarity.clusterEmbeddings(Tables.embeddings(spark, dir),
        "vec_id", "embedding", dim = 64, nlist = 16)
      val t1 = System.nanoTime() // includes the digest-sample fit
      val plan = df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[embed-cluster] round=$round fit=${(t1 - t0) / 1e9}%.2fs " +
        f"plan=${(t2 - t1) / 1e9}%.2fs exec=${(t3 - t2) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
