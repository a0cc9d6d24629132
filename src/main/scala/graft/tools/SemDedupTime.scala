package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off timing for a single gate query at the bench sf (dev
  * evidence). Usage: runMain graft.tools.SemDedupTime [n] [query]
  * (defaults: 2 runs of q_dedup_semantic). */
object SemDedupTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val n = args.headOption.map(_.toInt).getOrElse(2)
    val q = args.lift(1).getOrElse("q_dedup_semantic")
    for (i <- 1 to n) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[semtime] $q run=$i wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      graft.CacheScope.releaseAll()
    }
    spark.stop()
  }
}
