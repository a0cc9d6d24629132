package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.PipelineOps

/** Scale probe for the round-14 order/selection family —
  * [[PipelineOps.shuffleOrder]] (seeded zipWithIndex permutation),
  * [[PipelineOps.selectByBudget]] (quality-ordered prefix cut), and
  * [[PipelineOps.interleaveGroups]] (round-robin domain mixing) — at
  * m and 4m synthetic rows: all three ride range shuffles + the
  * distributed prefix machinery, so walls should scale ~linearly in
  * rows (the 4× step should cost ≈4×, not 16×), and the driver only
  * ever sees one long per partition (plus |groups| offsets for the
  * interleave). Dev evidence for ARCHITECTURE.md's scale rows, not a
  * gate surface.
  *
  * Usage: sbt "runMain graft.tools.OrderSelectProbe [rows]"
  */
object OrderSelectProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm-up

    def corpus(m: Long) = spark.range(m).select(col("id"),
      (col("id") % 1000 + 50).as("w"),
      (col("id") % 977).cast("double").as("score"),
      concat(lit("dom"), (col("id") % 12).cast("string")).as("g"))

    Seq(base, 4L * base).foreach { m =>
      val df = corpus(m)
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        graft.CacheScope.releaseAll(); (dt, n)
      }
      val (tOrd, nOrd) = time {
        PipelineOps.shuffleOrder(df, "id", seed = 7L)
          .agg(max("shuffle_pos")).collect()(0).getLong(0)
      }
      // budget = ~half the total weight: the cut scans everything,
      // keeps ~half — the representative selection shape
      val budget = m * 550 / 2
      val (tSel, nSel) = time {
        PipelineOps.selectByBudget(df, "id", "w", "score", budget).count()
      }
      val (tIlv, nIlv) = time {
        PipelineOps.interleaveGroups(df, "id", "g", seed = 7L)
          .agg(max("interleave_pos")).collect()(0).getLong(0)
      }
      println(f"[order-select] m=$m%9d  shuffleOrder=$tOrd%6.1fs (max_pos=$nOrd%d)  " +
        f"selectByBudget=$tSel%6.1fs (kept=$nSel%d)  interleave=$tIlv%6.1fs (max_pos=$nIlv%d)")
    }
    spark.stop()
  }
}
