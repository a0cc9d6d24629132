package graft.tools

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TBasic
import graft.sources.Tables

/** Scratch: kmeans|| vs random init cost on the bench shape. */
object KMeansExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.1")
    val feats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val norm = TBasic.minMaxNormalize(
      li.select(("l_orderkey" +: "l_linenumber" +: feats).map(col): _*), feats)
    val assembled = new VectorAssembler().setInputCols(feats.toArray)
      .setOutputCol("__f").setHandleInvalid("keep").transform(norm).cache()
    assembled.count()
    for (mode <- Seq("k-means||", "random", "k-means||", "random")) {
      val t0 = System.nanoTime()
      val m = new org.apache.spark.ml.clustering.KMeans()
        .setK(3).setSeed(9).setFeaturesCol("__f").setInitMode(mode).fit(assembled)
      val cost = m.summary.trainingCost
      println(f"$mode%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s  cost=$cost%.3f")
    }
    spark.stop()
  }
}
