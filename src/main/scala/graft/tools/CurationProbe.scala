package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{CurationKernels, TextFunctions}
import graft.operators.CurationRules

/** Scratch probe backing the CurationRules kernel claim: the
  * declarative Gopher spelling (two tokenizations + a line split +
  * five interpreted HOF lambda passes per document) vs the single-sweep
  * byte kernel ([[graft.functions.GopherStats]]), and the same
  * comparison for the C4 line filter. Same line-structured fixture
  * shape as the q_gopher_quality gate, at sf0.1. Not part of the
  * driver contract. Usage: runMain graft.tools.CurationProbe
  */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def best(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-26s min ${ts.min}%.3f s  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the gate's OWN line fixture (shared builder — the probe measures
    // and parity-checks the exact q_gopher_quality corpus)
    val fixture = graft.ExtQueries.lineFixture(spark, dir)
      .select(col("doc_id"), col("text"))
      .persist()
    println(s"fixture rows: ${fixture.count()}")

    // declarative HOF spelling (what CurationRules shipped first, and
    // what the DuckDB oracle still replays)
    def hofGopher(df: DataFrame): DataFrame = {
      val base = df.select(col("doc_id"), coalesce(col("text"), lit("")).as("__text"))
      val arr = base.select(col("doc_id"), col("__text"),
        TextFunctions.tokens(col("__text")).as("__toks"),
        TextFunctions.tokens(lower(col("__text"))).as("__ltoks"),
        split(col("__text"), java.util.regex.Pattern.quote("\n")).as("__lines"))
      def charSum(c: Column): Column =
        aggregate(transform(c, l => length(l).cast("long")), lit(0L), (a, b) => a + b)
      val nWords = size(col("__toks")).cast("long")
      val nLines = size(col("__lines")).cast("long")
      arr.select(col("doc_id"), nWords.as("n_words"),
        charSum(col("__toks")).as("tok_chars"),
        ((length(col("__text")) - length(replace(col("__text"), lit("#"), lit("")))) +
          (length(col("__text")) - length(replace(col("__text"), lit("..."), lit("")))) / 3 +
          (length(col("__text")) - length(replace(col("__text"), lit("…"), lit("")))))
          .cast("long").as("symbols"),
        size(filter(col("__lines"), l =>
          l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• "))).cast("long")
          .as("bullet_lines"),
        size(filter(col("__lines"), l =>
          l.endsWith("...") || l.endsWith("…"))).cast("long").as("ellipsis_lines"),
        size(filter(col("__toks"), t => t.rlike("[A-Za-z]"))).cast("long").as("alpha_words"),
        size(filter(col("__ltoks"),
          t => t.isInCollection(CurationRules.GopherStopwords))).cast("long").as("stop_count"),
        nLines.as("n_lines"),
        (nLines - size(array_distinct(col("__lines"))).cast("long")).as("dup_lines"),
        charSum(col("__lines")).as("line_chars"),
        (charSum(col("__lines")) - charSum(array_distinct(col("__lines"))))
          .as("dup_line_chars"))
    }
    def kernelGopher(df: DataFrame): DataFrame =
      df.select(col("doc_id"),
        CurationKernels.gopherStats(coalesce(col("text"), lit("")), "\n").as("s"))
        .select(col("doc_id"), col("s.*"))

    // value parity first — a fast kernel that drifts is worthless
    val diff = hofGopher(fixture).exceptAll(kernelGopher(fixture)).count()
    println(s"hof-vs-kernel mismatching rows: $diff")
    require(diff == 0, "kernel drifted from the declarative spelling")

    best("gopher HOF spelling")(noop(hofGopher(fixture)))
    best("gopher kernel")(noop(kernelGopher(fixture)))
    best("c4 via CurationRules")(noop(CurationRules.c4Clean(fixture, "doc_id", "text")))
    best("full gopherSignals")(noop(CurationRules.gopherSignals(fixture, "doc_id", "text")))

    // scaled phase: 500k line-structured docs (fixture ×100 with
    // distinct ids) — the linear-throughput data point behind the
    // "scan-bandwidth-bound at any corpus size" claim
    val big = (0 until 100).map(i =>
        fixture.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _).persist()
    val nBig = big.count()
    best(s"gopher kernel ${nBig / 1000}k docs")(noop(kernelGopher(big)))
    best(s"c4 kernel ${nBig / 1000}k docs")(
      noop(CurationRules.c4Clean(big, "doc_id", "text")))
    big.unpersist()
    fixture.unpersist()
    spark.stop()
  }
}
