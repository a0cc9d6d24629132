package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Round-15 measurement batcher (guide §1: measure first, and label
  * what you measure). For a comma-separated query list, in ONE Spark
  * session per invocation:
  *
  *   1. writes `.explain("formatted")` to `<outdir>/<query>_<tag>.txt`
  *      (the judge-checkable plan evidence for plans/r15/),
  *   2. times the query n times under the exact Bench protocol
  *      (clearCache + CacheScope.releaseAll per run, noop sink),
  *   3. prints a per-job wall decomposition of the BEST run (jobs with
  *      submit→end wall, so a 2 s query reads as "persist 0.8 s +
  *      agg 0.4 s + gaps 0.3 s" instead of one number).
  *
  * Usage: runMain graft.tools.R15Probe <outdir> <tag> <q1,q2,...> [n]
  * Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error(
      "usage: R15Probe <outdir> <tag> <q1,q2,...> [n]"))
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val n = args.lift(3).map(_.toInt).getOrElse(3)
    names.foreach(q => require(graft.SparkEntry.queries.contains(q),
      s"unknown query '$q'"))
    Files.createDirectories(Paths.get(outDir))

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect() // codegen warm-up

    case class Job(id: Int, desc: String, start: Long, var end: Long = -1L)
    case class Stg(id: Int, name: String, wall: Double, tasks: Int,
                   runMs: Long, inB: Long, srB: Long, swB: Long)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val stages = mutable.ArrayBuffer.empty[Stg]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobs(e.jobId) = Job(e.jobId, d, e.time)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = e.stageInfo
          val m = si.taskMetrics
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield (c - s) / 1e3).getOrElse(-1.0)
          stages += Stg(si.stageId, si.name, wall, si.numTasks,
            if (m == null) 0L else m.executorRunTime,
            if (m == null) 0L else m.inputMetrics.bytesRead,
            if (m == null) 0L else m.shuffleReadMetrics.totalBytesRead,
            if (m == null) 0L else m.shuffleWriteMetrics.bytesWritten)
        }
    })

    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      // capture the formatted plan (same rendering as df.explain)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      graft.CacheScope.releaseAll()
      spark.catalog.clearCache()

      var best = Double.MaxValue
      var bestJobs = Vector.empty[(Double, String)]
      var bestStages = Vector.empty[Stg]
      val times = (1 to n).map { _ =>
        jobs.synchronized { jobs.clear(); stages.clear() }
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        graft.CacheScope.releaseAll()
        Thread.sleep(150)
        if (wall < best) {
          best = wall
          jobs.synchronized {
            bestJobs = jobs.values.toVector
              .map(j => (math.max(0L, j.end - j.start) / 1e3, j.desc))
            bestStages = stages.toVector
          }
        }
        wall
      }
      val sorted = times.sorted
      val med = sorted(sorted.size / 2)
      println(f"\n=== $name: min ${sorted.head}%.3f med $med%.3f " +
        f"(n=$n: ${times.map(t => f"$t%.2f").mkString(",")}) ===")
      val jobSum = bestJobs.map(_._1).sum
      println(f"  best-run jobs ${bestJobs.size}, job-sum $jobSum%.3f s, " +
        f"gap ${sorted.head - jobSum}%.3f s")
      bestStages.sortBy(-_.wall).take(14).foreach { s =>
        println(f"  stage ${s.id}%3d wall ${s.wall}%6.3f s run ${s.runMs / 1e3}%7.3f s " +
          f"tasks ${s.tasks}%3d in ${s.inB / 1024}%6d K sr ${s.srB / 1024}%6d K " +
          f"sw ${s.swB / 1024}%6d K  ${s.name.take(60)}")
      }
    }
    spark.stop()
  }
}
