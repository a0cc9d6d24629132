package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale probe for ExactSubstr span dedup: 1M synthetic ~32-token
  * documents, 2% of them verbatim copies of one shared passage (≈20k
  * occurrences of every duplicated span — a hot span hash). Compares
  * the shipped keeper choice (min(struct(id,pos)) INSIDE the count
  * agg — map-side combinable, one pass) against the naive
  * window spelling (`ROW_NUMBER over (PARTITION BY hash)`), which
  * shuffles every occurrence of the hot hash to one window partition
  * and adds a second wide stage. Dev evidence for the Dedup.dedupSpans
  * scaladoc, not a gate surface.
  *
  * Usage: sbt "runMain graft.tools.DedupSpansProbe [rows] [naive]"
  */
object DedupSpansProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val naive = args.lift(1).contains("naive")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shared = (1 to 32).map(i => s"dup$i").mkString(" ")
    // collision-free unique tokens (w<id>_<j>): the only duplicated
    // spans are the planted shared passages
    val unique = array_join(transform(sequence(lit(0), lit(31)),
      j => concat(lit("w"), col("id"), lit("_"), j)), " ")
    val df = spark.range(rows).select(col("id"),
      when(col("id") % 50 === 0, lit(shared)).otherwise(unique).as("text"))
    val k = 8
    val t0 = System.nanoTime()
    val out =
      if (naive) {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.{TextFunctions, Tokenize}
        val toks = TextFunctions.tokens(coalesce(col("text"), lit("")))
        val occ = graft.CacheScope.track(df.select(col("id"),
            posexplode(Tokenize.wordShingles(toks, k)).as(Seq("__pos", "__gram")))
          .select(col("id"), col("__pos"), md5(col("__gram")).as("__h")))
        val wh = Window.partitionBy(col("__h")).orderBy(col("id"), col("__pos"))
        val marked = occ
          .withColumn("__c", count(lit(1)).over(wh.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("__rn", row_number().over(wh))
          .where(col("__c") > 1 && col("__rn") > 1)
        val covered = marked.select(col("id"),
          explode(sequence(col("__pos"), col("__pos") + lit(k - 1))).as("__tp")).distinct()
        val keptCnt = df.select(col("id"), posexplode(toks).as(Seq("__tp", "__tok")))
          .join(covered, Seq("id", "__tp"), "left_anti")
          .groupBy("id").agg(count(lit(1)).as("__kept"))
        // join back so fully-removed docs count as 0, like the shipped op
        df.select(col("id")).join(keptCnt, Seq("id"), "left")
          .select(col("id"), coalesce(col("__kept"), lit(0L)).as("n_tokens_kept"))
      } else Dedup.dedupSpans(df, "id", "text", k)
        .select(col("id"), col("n_tokens_kept"))
    val removedDocs = out.where(col("n_tokens_kept") < 32).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[dedup-spans] rows=$rows%d mode=${if (naive) "window-keeper" else "agg-keeper"}%s " +
      f"wall=$dt%.1fs docs_losing_tokens=$removedDocs%d")
    graft.CacheScope.releaseAll()
    spark.stop()
  }
}
