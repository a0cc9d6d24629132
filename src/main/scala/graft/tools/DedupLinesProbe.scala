package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.PipelineOps

/** Scale probe for the first-occurrence line dedup rebuild: runs the
  * shipped shape (winner agg over (hash, id, pos) triples → id-keyed
  * position arrays → row-local `element_at` rebuild against the
  * original row) against the naive spelling that joins winners back to
  * the exploded frame and re-aggregates lines with `collect_list` —
  * the version that ships every surviving line's text through TWO more
  * exchanges. Synthetic corpus: `docs` documents × 40 lines drawn from
  * a shared pool (so ~half the occurrences lose), each line ~60 chars.
  * Dev evidence, not a gate surface.
  *
  * Usage: sbt "runMain graft.tools.DedupLinesProbe [docs] [naive]"
  */
object DedupLinesProbe {
  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toLong).getOrElse(300000L)
    val naive = args.lift(1).contains("naive")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 30% of documents draw each line position from a 100-value hot
    // pool (≈ docs×0.3/100 claimants per hot line — ~900 at the
    // default size), the rest from a wide pool with ~2 claimants per
    // line: the hot head exercises the winner agg's map-side combine,
    // the tail exercises volume
    val df = spark.range(docs).select(col("id").as("doc_id"),
      concat_ws("\n", (0 until 40).map { i =>
        val pool = when(col("id") % 10 < 3, pmod(col("id") + i * 7, lit(100)))
          .otherwise(pmod(col("id") * 40 + i * 7919, lit(docs * 20)) + 1000)
        concat(lit(s"line-$i-"), pool, lit("-" + "x" * 40))
      }: _*).as("text"))
    val t0 = System.nanoTime()
    val out =
      if (naive) naiveDedupLines(df) else PipelineOps.dedupLines(df, "doc_id", "text")
    val stats = out.agg(sum("n_lines"), sum("n_lines_kept"),
      sum(length(col("text_dedup")))).collect()(0)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[dedup-lines] docs=$docs%d mode=${if (naive) "naive-2-text-shuffles" else "shipped"}%s " +
      f"wall=$dt%.1fs lines=${stats.getLong(0)}%d kept=${stats.getLong(1)}%d " +
      f"out_chars=${stats.getLong(2)}%d")
    spark.stop()
  }

  /** The rejected spelling: winners equi-join back to the exploded
    * (id, pos, line) frame, then a collect_list re-aggregation — line
    * text crosses the join exchange AND the rebuild exchange. */
  private def naiveDedupLines(df: DataFrame): DataFrame = {
    val segs = df.select(col("doc_id"),
        posexplode(split(coalesce(col("text"), lit("")), "\n"))
          .as(Seq("__pos", "__line")))
      .withColumn("__h", md5(col("__line")))
    val winners = segs.groupBy(col("__h"))
      .agg(min(struct(col("doc_id"), col("__pos"))).as("__w"))
      .select(col("__h"), col("__w.doc_id").as("doc_id"), col("__w.__pos").as("__pos"))
    val rebuilt = segs.join(winners, Seq("doc_id", "__pos", "__h"))
      .groupBy(col("doc_id")).agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line")), "\n").as("text_dedup"),
        count(lit(1)).as("n_lines_kept"))
    df.select(col("doc_id"),
        size(split(coalesce(col("text"), lit("")), "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        col("n_lines"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"))
  }
}
