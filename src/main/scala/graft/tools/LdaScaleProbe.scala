package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.CoreT
import graft.sources.Tables

/** Scale probe for the distributed LDA E-step: runs CoreT.lda over
  * lineitem (600k rows at sf0.1 — 3× the old driver cap that round 6
  * removed) and prints wall time + label distribution. Dev evidence,
  * not a gate surface.
  *
  * Usage: sbt "runMain graft.tools.LdaScaleProbe [sfDir]"
  */
object LdaScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val n = df.count()
    val t0 = System.nanoTime()
    val windowMax = args.lift(1).map(_.toLong).getOrElse(100000L)
    val out = CoreT.lda(df,
      features = Seq("l_quantity", "l_extendedprice", "l_discount"),
      carry = Seq("l_orderkey", "l_linenumber"), windowRankMaxRows = windowMax).get
    val byLabel = out.groupBy("Category by LDA").count().collect()
      .map(r => r.getString(0).take(24) -> r.getLong(1)).sortBy(-_._2)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[lda-scale] rows=$n%d wall=$dt%.1fs labels=${byLabel.length}%d " +
      byLabel.map { case (l, c) => s"'$l…'=$c" }.mkString(" "))
    graft.CacheScope.releaseAll()
    spark.stop()
  }
}
