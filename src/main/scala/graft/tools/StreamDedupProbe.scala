package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDemo

/** Real-data-scale equivalence + throughput probe for the streaming
  * near-dedup: the whole near-dup gate corpus (documents + truncated
  * copies, the q_dedup_stream_verdicts fixture) is fed through
  * [[StreamingDemo.minhashDedupStream]] in `nBatches` micro-batches in
  * ascending-id order, and the collapsed verdicts must EQUAL the batch
  * twin's row-for-row — the 5-doc StreamingSpec check at corpus scale,
  * plus wall-clock and state-size figures for BASELINE.md.
  *
  * Usage: runMain graft.tools.StreamDedupProbe [sfDir] [nBatches]
  */
object StreamDedupProbe {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)

    // the SAME planted-duplicate fixture the oracle gate runs on —
    // shared builder, so this probe's equivalence evidence cannot
    // silently drift from q_dedup_stream_verdicts' corpus
    val corpus = graft.ExtQueries.nearDupCorpus(spark, dir)
      .select(col("id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    println(s"[stream-dedup] corpus=${corpus.length} docs, $nBatches micro-batches")

    val mem = MemoryStream[(Long, String)]
    val q = StreamingDemo.minhashDedupStream(
        mem.toDF().toDF("doc_id", "text"), tau = 0.3)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_dedup_probe").start()
    val t0 = System.nanoTime()
    try {
      val per = math.max(1, (corpus.length + nBatches - 1) / nBatches)
      corpus.grouped(per).foreach { chunk =>
        mem.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamSec = (System.nanoTime() - t0) / 1e9

    val streamed = StreamingDemo.collapseNearDupVerdicts(
        spark.table("stream_dedup_probe"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val t1 = System.nanoTime()
    val batch = StreamingDemo.collapseNearDupVerdicts(
        StreamingDemo.minhashDedupStream(
          corpus.toSeq.toDF("doc_id", "text"), tau = 0.3).toDF())
      .as[(Long, Long, Long, Double)].collect().toSet
    val batchSec = (System.nanoTime() - t1) / 1e9

    val equal = streamed == batch
    val nDup = streamed.count(_._2 == 1L)
    println(f"[stream-dedup] stream=$streamSec%.1f s over $nBatches batches " +
      f"(${corpus.length / streamSec}%.0f docs/s incl. per-batch overhead), " +
      f"batch=$batchSec%.1f s, verdicts=${streamed.size}, dups=$nDup, " +
      s"stream==batch: $equal")
    require(equal, "streaming and batch verdicts diverged")
    spark.stop()
  }
}
