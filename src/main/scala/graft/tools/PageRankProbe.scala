package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** Scale probe for [[PageRank]]'s claim: the sf0.1 cost is
  * per-iteration JOB OVERHEAD, and the operator turns scan-bound as
  * the graph grows. Runs 3 fixed-point iterations on synthetic graphs
  * of two sizes (default 1M and 8M directed edges over a node set
  * ~1/10 the edge count — mixed in/out degrees, deterministic
  * arithmetic, no RNG) and reports wall seconds. Scan-bound means the
  * 8× edge graph costs far LESS than 8× the 1M wall; the two totals
  * plus the sf0.1 gate median (~5 s over 60k edges) make the
  * amortization curve explicit. Also asserts the fixed-point
  * invariant end-to-end at probe scale: total micro-mass loss stays
  * within the floor-bias bound (≲ iters·(E + 2N) micro-units — each
  * out-degree split can strand outdeg−1 units per node per round).
  *
  * Dev evidence for the PageRank scaladoc + BASELINE.md, not a gate
  * surface. Usage: sbt "runMain graft.tools.PageRankProbe [edges1] [edges2]"
  */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val sizes = Seq(
      args.headOption.map(_.toLong).getOrElse(1000000L),
      args.lift(1).map(_.toLong).getOrElse(8000000L))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm-up

    sizes.foreach { edges =>
      val nodes = math.max(edges / 10L, 10L)
      // deterministic mixed-degree graph: a skewed source (quadratic
      // fold concentrates low ids) pointing at a scattered target
      val g = spark.range(edges).select(
        ((col("id") * col("id") + col("id")) % nodes).as("src"),
        ((col("id") * 2654435761L + 11L) % nodes + nodes).as("dst"))
      val t0 = System.nanoTime()
      val ranks = PageRank.pageRank(g, "src", "dst", iters = 3)
      val total = ranks.agg(sum(col("pagerank_micro"))).head().getLong(0)
      val n = ranks.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val lost = PageRank.SCALE - total
      val bound = 3L * (edges + 2L * n) + n
      require(lost >= 0 && lost < bound,
        s"mass invariant violated: lost=$lost of ${PageRank.SCALE} over $n nodes (bound $bound)")
      println(f"edges=$edges%9d nodes=$n%8d  wall=$sec%7.2f s  " +
        f"micro-mass lost=$lost (bound $bound, ${lost * 1e-12 * 100}%.5f%% of total)")
    }
    spark.stop()
  }
}
