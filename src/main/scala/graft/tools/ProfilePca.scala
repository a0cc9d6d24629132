package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local-only stage breakdown for q_coret_pca / q_coret_kmeans wall
  * time (not run by the driver; kept for reproducible perf triage). */
object ProfilePca {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val li = graft.sources.Tables.lineitem(spark, dir)
    val feats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    for (round <- 1 to 2) {
      println(s"--- round $round")
      t("raw scan noop") {
        li.select(("l_orderkey" +: "l_linenumber" +: feats).map(col): _*)
          .write.format("noop").mode("overwrite").save()
      }
      t("minmax agg only") {
        graft.operators.TBasic.minMaxNormalize(
          li.select(("l_orderkey" +: "l_linenumber" +: feats).map(col): _*), feats)
          .queryExecution.executedPlan // plan only
        li.agg(feats.flatMap(c => Seq(min(col(c)), max(col(c)))).head,
          feats.flatMap(c => Seq(min(col(c)), max(col(c)))).tail: _*).head()
      }
      t("full pca noop") {
        graft.operators.CoreT.pca(li, feats, Seq("l_orderkey", "l_linenumber")).get
          .write.format("noop").mode("overwrite").save()
      }
      t("full kmeans noop") {
        graft.operators.CoreT.kmeans(li, feats, Seq("l_orderkey", "l_linenumber"),
          fitCap = 2000).get
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
