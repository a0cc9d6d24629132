package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scale probe for the round-15 distributed-query ANN paths
  * ([[Similarity.ivfTopKDistributed]] / [[Similarity.ivfPqTopKDistributed]]):
  * the query frame is HALF the corpus (the shape the driver-collect
  * contract forbids), so candidate volume ≈ (m/2)·nprobe·(m/nlist)
  * exact-cosine (resp. m-term ADC) pairs — the same m^1.5-ish model as
  * [[KnnGraphProbe]] once autoNlist saturates the fit-sample cap.
  * Walls at m, 2m, 4m should track that model, not the m² of a
  * collect-and-broadcast scan; the codebook is fit ONCE per corpus via
  * the handle (the session amortization), and the fit wall is printed
  * separately so the distributed-join term is read clean.
  *
  * Dev evidence for BASELINE.md, not a gate surface.
  * Usage: sbt "runMain graft.tools.DistQueryAnnProbe [m]"
  */
object DistQueryAnnProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm-up

    val dim = 16
    def corpus(m: Long) = spark.range(m).select(col("id"),
      expr(s"transform(sequence(0, ${dim - 1}), i -> " +
        "cast(((id * 2654435761 + i * 97) % 1000) / 1000.0 + 0.001 as float))")
        .as("v"))

    // the engine's own rule over the fit-sample cap — not a re-derived
    // copy that could silently drift from the real nlist
    def modelNlist(m: Long): Int =
      Similarity.autoNlist(math.min(m, 100000L).toInt)

    Seq(base.toLong, 2L * base, 4L * base).foreach { m =>
      val c = corpus(m)
      val q = c.where(col("id") % 2 === 0)
      val nlist = modelNlist(m)
      val modelPairs = (m.toDouble / 2) * 4 * (m.toDouble / nlist)
      val tf0 = System.nanoTime()
      val cb = Similarity.fitIvfCodebook(c, "id", "v", dim = dim)
      val fitSec = (System.nanoTime() - tf0) / 1e9
      val t0 = System.nanoTime()
      val ivfRows = Similarity.ivfTopKDistributedWith(c, q, "id", "v",
        k = 3, cb).count()
      val ivfSec = (System.nanoTime() - t0) / 1e9
      graft.CacheScope.releaseAll()
      val t1 = System.nanoTime()
      val pqRows = Similarity.ivfPqTopKDistributedWith(c, q, "id", "v",
        k = 3, cb, m = 4, ksub = 16, candidates = 20).count()
      val pqSec = (System.nanoTime() - t1) / 1e9
      graft.CacheScope.releaseAll()
      require(ivfRows > 0 && pqRows > 0, "distributed ANN returned no rows")
      println(f"m=$m%8d nq=${m / 2}%8d nlist=$nlist%4d " +
        f"model_pairs=${modelPairs / 1e6}%9.1fM  fit=$fitSec%6.2f s  " +
        f"ivf_dist=$ivfSec%7.2f s ($ivfRows%d rows)  " +
        f"ivfpq_dist=$pqSec%7.2f s ($pqRows%d rows)")
    }
    spark.stop()
  }
}
