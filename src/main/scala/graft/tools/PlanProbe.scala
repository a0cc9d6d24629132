package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch plan inspector (not part of the library surface): prints the
  * formatted physical plan and timing for one declared query. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .appName("plan-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    // clear per run like Bench: operators that persist self-join inputs
    // must not hand the second run a warm cache
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[probe] $name first: ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.catalog.clearCache()
    val t1 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[probe] $name second: ${(System.nanoTime()-t1)/1e9}%.2f s")
    spark.stop()
  }
}
