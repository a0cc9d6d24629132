package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scale probe for [[Similarity.knnGraph]]'s cost model: candidate
  * volume ≈ m·nprobe·(m/nlist) pairs (so m^1.5 while autoNlist ≈ √m,
  * NOT the m² of an all-pairs scan), and the maxListSize guard turns a
  * degenerate codebook into a loud drop instead of a quadratic join.
  *
  * Three synthetic corpora (deterministic hash-derived 16-dim vectors,
  * no RNG) at m, 2m, 4m vectors with autoNlist: walls should track the
  * MODEL's candidate ratio (≈2.8×/step once the √m list count saturates
  * the 100k fit-sample cap — m/nlist then grows linearly) rather than
  * the 4×/step an m² scan would show. The model volume is printed next
  * to each wall so the curve is explicit in the record.
  *
  * Degenerate arm: a constant-vector corpus collapses every row into
  * ONE list; with maxListSize below m, [[graft.operators.Dedup.capBuckets]]
  * must drop the hot list (0 output rows, sub-linear wall) — the probe
  * asserts both, because the failure mode it guards is the silent
  * m²-pair join.
  *
  * Dev evidence for the knnGraph scaladoc + BASELINE.md, not a gate
  * surface. Usage: sbt "runMain graft.tools.KnnGraphProbe [m]"
  */
object KnnGraphProbe {
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

    // the engine's own autoNlist over the fit-sample cap
    // (Similarity.collectFitSample) — not a re-derived copy
    def modelNlist(m: Long): Int =
      Similarity.autoNlist(math.min(m, 100000L).toInt)

    Seq(base.toLong, 2L * base, 4L * base).foreach { m =>
      val nlist = modelNlist(m)
      val modelPairs = m.toDouble * 4 * (m.toDouble / nlist)
      val t0 = System.nanoTime()
      val rows = Similarity.knnGraph(corpus(m), "id", "v", k = 3, dim = dim).count()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.CacheScope.releaseAll()
      println(f"m=$m%8d nlist=$nlist%4d model_pairs=${modelPairs / 1e6}%9.1fM  " +
        f"wall=$sec%7.2f s  out_rows=$rows%d")
    }

    // degenerate codebook: every vector identical -> one list; the cap
    // must drop it loudly instead of joining m² pairs
    val m = base.toLong
    val degenerate = spark.range(m).select(col("id"),
      expr(s"transform(sequence(0, ${dim - 1}), i -> cast(0.5 as float))").as("v"))
    val t0 = System.nanoTime()
    val rows = Similarity.knnGraph(degenerate, "id", "v", k = 3, dim = dim,
      maxListSize = 1000L).count()
    val sec = (System.nanoTime() - t0) / 1e9
    graft.CacheScope.releaseAll()
    println(f"degenerate m=$m%8d maxListSize=1000  wall=$sec%7.2f s  out_rows=$rows%d")
    require(rows == 0L,
      s"degenerate codebook must drop the over-cap list (got $rows pairs)")

    // amortization arm (round-14): the driver Lloyd fit is the ANN
    // family's per-call constant — a pre-fitted Codebook handle pays
    // it ONCE. fit wall vs two handle-reuse walls: the reuse runs
    // carry only the distributed join term.
    val t1 = System.nanoTime()
    val cb = Similarity.fitIvfCodebook(corpus(m), "id", "v", dim = dim)
    val fitSec = (System.nanoTime() - t1) / 1e9
    val reuse = (1 to 2).map { _ =>
      val t = System.nanoTime()
      val n = Similarity.knnGraphWith(corpus(m), "id", "v", k = 3, cb).count()
      val s = (System.nanoTime() - t) / 1e9
      graft.CacheScope.releaseAll()
      (n, s)
    }
    println(f"handle    m=$m%8d fit_once=$fitSec%7.2f s  " +
      f"reuse_walls=${reuse.map(r => f"${r._2}%.2f").mkString("/")} s  " +
      f"out_rows=${reuse.head._1}%d")
    require(reuse.map(_._1).distinct.size == 1,
      "handle reuse must be deterministic")
    spark.stop()
  }
}
