package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Scratch probe: row-local vs aggregate MinHash signature stage, and
  * the full LSH pipeline, n=3 minima. Not part of the driver contract.
  * Usage: runMain graft.tools.MinhashProbe */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def best(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s min ${ts.min}%.3f s  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the gate fixture's derived corpus (originals + truncated copies)
    val d = Tables.documentsSpread(spark, dir).select(col("doc_id").as("id"), col("text"))
    val trunc = d.select((col("id") + 1000000L).as("id"),
      array_join(slice(graft.functions.TextFunctions.tokens(col("text")), lit(1),
        greatest((size(graft.functions.TextFunctions.tokens(col("text"))) * 4) / 5, lit(1)).cast("int")), " ").as("text"))
    val corpus = d.unionByName(trunc)

    if (args.headOption.contains("plan")) {
      Dedup.minhashSignatures(corpus, "id", "text").explain("formatted")
      spark.stop(); return
    }
    best("signatures row-local")(noop(Dedup.minhashSignatures(corpus, "id", "text")))
    best("signatures aggregate")(noop(Dedup.minhashSignaturesAgg(corpus, "id", "text")))
    best("lsh pairs row-local")(noop(Dedup.minhashCandidatePairs(
      Dedup.minhashSignatures(corpus, "id", "text"), 32, 8, 0.3)))
    best("lsh pairs aggregate")(noop(Dedup.minhashCandidatePairs(
      Dedup.minhashSignaturesAgg(corpus, "id", "text"), 32, 8, 0.3)))
    spark.stop()
  }
}
