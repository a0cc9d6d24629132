package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Scale probe for the heavy-hitter operator's claim: exact frequent
  * items WITHOUT shuffling the full vocabulary. 20M rows over a
  * ~2M-value vocabulary (8 planted hot values at 6.25% each + uniform
  * cold tail), measured two ways:
  *
  *  - shipped: MG sketch pass (k-entry state) + isin-confirm pass —
  *    only ≤ k candidate strings cross the driver boundary, the
  *    confirm groupBy touches ≤ k distinct values;
  *  - naive: full `groupBy(value).count()` then filter — shuffles the
  *    whole ~2M-entry vocabulary to build counts it then throws away.
  *
  * Both must return the identical hitter set (asserted). Dev evidence
  * for the HeavyHitters scaladoc, not a gate surface.
  *
  * Usage: sbt "runMain graft.tools.HeavyHittersProbe [rows] [naive]"
  */
object HeavyHittersProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val naive = args.lift(1).contains("naive")
    val k = 32
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the honest cluster argument is shuffle VOLUME, not single-box
    // wall (a 32-thread JVM hash-aggregates a 2M-value vocab in-memory
    // just fine; a 1000-executor network does not enjoy re-keying it)
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffled.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    // 8 hot values at 6.25% each (> 1/32), cold tail = half the rows
    // spread uniformly over ~rows/10 distinct values (each far below
    // threshold)
    val df = spark.range(rows).select(
      when(col("id") % 16 < 8, concat(lit("hot"), col("id") % 16))
        .otherwise(concat(lit("cold"), col("id") % (rows / 10))).as("value"))
    val t0 = System.nanoTime()
    val result =
      if (naive) {
        val n = rows
        df.groupBy("value").agg(count(lit(1)).as("cnt"))
          .where(col("cnt") * k > n).withColumn("total", lit(n))
      } else HeavyHitters.frequentValues(df, "value", k)
    val hitters = result.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val dt = (System.nanoTime() - t0) / 1e9
    val expected = (0 until 8).map(i => s"hot$i").toSet
    assert(hitters.map(_._1).toSet == expected,
      s"hitter set wrong: ${hitters.mkString(",")}")
    Thread.sleep(500) // let the listener bus drain stage-completed events
    println(f"[hh-probe] mode=${if (naive) "naive" else "sketch"} rows=$rows " +
      f"k=$k hitters=${hitters.length} sec=$dt%.1f " +
      f"shuffleMB=${shuffled.get() / 1e6}%.1f")
    spark.stop()
  }
}
