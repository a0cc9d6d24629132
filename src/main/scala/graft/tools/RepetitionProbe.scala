package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, Tokenize}
import graft.operators.PipelineOps
import graft.sources.Tables

/** Scratch probe: where does q_text_repetition's wall time go?
  * Times each prefix of the operator's plan (tokenize → explode →
  * count agg → pivot agg → spine join) with n=3 minima, plus a
  * no-tag union variant for comparison. Not part of the driver
  * contract. Usage: runMain graft.tools.RepetitionProbe
  */
object RepetitionProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def best(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-22s min ${ts.min}%.3f s  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }

    val docs = Tables.documentsSpread(spark, dir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val toks = docs.select(col("doc_id"),
      TextFunctions.tokens(coalesce(col("text"), lit(""))).as("__t"))
    def tagged(n: Int, grams: org.apache.spark.sql.Column) =
      transform(grams, g => struct(lit(n).as("n"), g.as("gram")))
    val grams = toks.select(col("doc_id"),
      explode(concat(
        tagged(1, col("__t")),
        tagged(2, Tokenize.wordShingles(col("__t"), 2)),
        tagged(5, Tokenize.wordShingles(col("__t"), 5)))).as("g"))
      .select(col("doc_id"), col("g.n"), col("g.gram"))
    val counted = grams.groupBy(col("doc_id"), col("n"), col("gram"))
      .agg(count(lit(1)).as("cnt"))

    best("tokenize only")(noop(toks))
    best("explode grams")(noop(grams))
    best("count agg")(noop(counted))
    best("full operator")(noop(
      PipelineOps.repetitionSignals(docs, "doc_id", "text")))

    // union-of-three-explodes variant (3 scans, flat projections)
    val u = Seq(
      toks.select(col("doc_id"), lit(1).as("n"), explode(col("__t")).as("gram")),
      toks.select(col("doc_id"), lit(2).as("n"),
        explode(Tokenize.wordShingles(col("__t"), 2)).as("gram")),
      toks.select(col("doc_id"), lit(5).as("n"),
        explode(Tokenize.wordShingles(col("__t"), 5)).as("gram"))
    ).reduce(_ unionAll _)
    best("union-explode grams")(noop(u))
    best("union-explode agg")(noop(
      u.groupBy(col("doc_id"), col("n"), col("gram")).agg(count(lit(1)).as("cnt"))))

    // row-local stats expression (the shipped shape): no explode, no
    // shuffle — counts never cross documents, so nothing needs to move
    best("stats-expr operator")(noop(
      toks.select(col("doc_id"), Tokenize.repetitionStats(col("__t"), 5).as("s"))))

    spark.stop()
  }
}
