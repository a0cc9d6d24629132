package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Measurement probe for the round-15 gate codebook reuse
  * (ExtQueries.embCodebook16/embCodebookParity8 through CodebookCache):
  * times the three deterministic IVF fits a Verify session used to pay
  * repeatedly — the full-corpus nlist=16 fit (5 consumers: ivf top-k,
  * distributed ivf, kNN graph, IVF-PQ coarse, embed cluster) and the
  * two parity nlist=8 fits (5 consumers across the three bitext
  * queries) — so BASELINE.md can record what the memo's 7 hits save
  * per session at a given SF. n runs each, medians printed.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.CodebookReuseProbe [n]
  */
object CodebookReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = args.headOption.map(_.toInt).getOrElse(5)
    spark.range(1000000).selectExpr("sum(id)").collect() // warm-up

    def med(name: String)(fit: => Similarity.Codebook): Unit = {
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime(); fit; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name%-28s median=${times(n / 2)}%.3f s  " +
        f"runs=${times.map(t => f"$t%.3f").mkString(", ")}")
    }
    val e = Tables.embeddings(spark, dir)
    med("fit emb nlist=16") {
      Similarity.fitIvfCodebook(e, "vec_id", "embedding", dim = 64, nlist = 16)
    }
    med("fit emb%2=1 nlist=8") {
      Similarity.fitIvfCodebook(e.where(col("vec_id") % 2 === 1),
        "vec_id", "embedding", dim = 64, nlist = 8)
    }
    med("fit emb%2=0 nlist=8") {
      Similarity.fitIvfCodebook(e.where(col("vec_id") % 2 === 0),
        "vec_id", "embedding", dim = 64, nlist = 8)
    }
    spark.stop()
  }
}
