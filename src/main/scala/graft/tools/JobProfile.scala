package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-job wall decomposition for one declared query — the measurement
  * companion to MicroBench q-mode (guide §1: find WHERE the time goes
  * before touching anything). Runs the named query under the bench
  * protocol (clearCache + CacheScope release per run, noop sink) with a
  * SparkListener recording every job's submit→end wall, stage count,
  * task count and description, so a 2 s query decomposes into "persist
  * materialization 0.8 s + hot-bucket agg 0.4 s + final join 0.6 s +
  * gaps (driver/planning/broadcast) 0.2 s" instead of one number.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.JobProfile <query> [n]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: JobProfile <query> [n]"))
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    require(graft.SparkEntry.queries.contains(name), s"unknown query '$name'")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect() // codegen warm-up

    case class Job(id: Int, desc: String, start: Long,
                   var end: Long = -1L, var stages: Int = 0, var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(e.jobId) = Job(e.jobId, d, e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val sid = e.stageInfo.stageId
          // attribute to the job containing this stage (best effort: last open job)
          jobs.values.lastOption.foreach { j =>
            j.stages += 1; j.tasks += e.stageInfo.numTasks
          }
          val _ = sid
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val q = graft.SparkEntry.queries(name)
    for (run <- 1 to n) {
      jobs.synchronized(jobs.clear())
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.CacheScope.releaseAll()
      Thread.sleep(200) // let listener events drain
      val snap = jobs.synchronized(jobs.values.toVector)
      val jobSum = snap.map(j => math.max(0L, j.end - j.start)).sum / 1e3
      println(f"\n=== $name run $run: wall $wall%.3f s, jobs ${snap.size}, job-sum $jobSum%.3f s, gap ${wall - jobSum}%.3f s ===")
      snap.foreach { j =>
        val dur = math.max(0L, j.end - j.start) / 1e3
        println(f"  job ${j.id}%3d ${dur}%7.3f s stages=${j.stages}%2d tasks=${j.tasks}%4d ${j.desc.take(80)}")
      }
    }
    spark.stop()
  }
}
