package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scale probe for distributed Lloyd refinement: 1M synthetic 64-dim
  * vectors (500× the gate fixture), sample-fit init + 2 full-corpus
  * refinement iterations. What's being demonstrated: per iteration the
  * corpus sees one expression scan + one aggregation whose reducer
  * keyspace is k·d = 1024 (cluster, dim) pairs with map-side combine —
  * driver traffic is 1024 rows per iteration regardless of corpus
  * size. Dev evidence for the refineCodebook scaladoc, not a gate
  * surface.
  *
  * Usage: sbt "runMain graft.tools.RefineProbe [rows] [iters]"
  */
object RefineProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val iters = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 16 planted gaussian-ish centers via integer mixing — deterministic
    val vec = transform(sequence(lit(0), lit(63)), j =>
      (pmod(col("id"), lit(16)) * 10 + j % 7).cast("float") +
        (pmod(col("id") * 2654435761L + j * 40503, lit(1000)) / 1000.0).cast("float"))
    val df = spark.range(rows).select(col("id"), vec.as("embedding"))
    val t0 = System.nanoTime()
    val out = Similarity.refineCodebook(df, "id", "embedding",
      dim = 64, nlist = 16, iters = iters)
    val n = out.count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[refine] rows=$rows%d iters=$iters%d wall=$dt%.1fs center_rows=$n%d")
    graft.CacheScope.releaseAll()
    spark.stop()
  }
}
