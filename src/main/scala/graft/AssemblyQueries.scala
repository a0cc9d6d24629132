package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.Recommender
import graft.profiler.Profiler
import graft.score.{Scagnostics, Significance}
import graft.sources.Tables

/** Declared queries for the scoring + recommendation layer (SURVEY
  * §2.11, §3.2). Driver-side math over bounded chart frames → emitted
  * as single-row / per-chart DataFrames. Not SQL-expressible (MST,
  * F/t distributions, search pipeline) → rows-only checks; exact
  * values are pinned by ScoreSpec instead.
  */
object AssemblyQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MST scagnostics over the (deduped, capped) part scatter
    "q_scagnostics" -> ((s, dir) => {
      val pts = Tables.part(s, dir)
        .select(col("p_size").cast("double"), col("p_retailprice").cast("double"))
        .na.drop().dropDuplicates().limit(4000).collect()
        .map(r => (r.getDouble(0), r.getDouble(1)))
      val g = new Scagnostics.Graph(pts)
      val row = Row(g.outlying, g.skewed, g.stringy, g.straight, g.striated,
        g.monotonic, g.clumpy)
      val schema = StructType(Seq("outlying", "skewed", "stringy", "straight",
        "striated", "monotonic", "clumpy").map(StructField(_, DoubleType)))
      s.createDataFrame(java.util.List.of(row), schema)
    }),

    // significance tests over per-group sums (the bar-chart scorers)
    "q_significance" -> ((s, dir) => {
      val sums = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("t"))
        .orderBy(col("o_orderpriority"))
        .select("t").collect().map(_.getDouble(0))
      val acct = Tables.customer(s, dir)
        .select(col("c_acctbal")).orderBy(col("c_acctbal"))
        .limit(2000).collect().map(_.getDouble(0))
      val row = Row(Significance.outstanding1(sums), Significance.linearness(acct),
        Significance.dispersion(sums), Significance.skewScore(sums),
        Significance.heavyTailScore(sums))
      val schema = StructType(Seq("outstanding1", "linearness", "dispersion",
        "skew", "heavytail").map(StructField(_, DoubleType)))
      s.createDataFrame(java.util.List.of(row), schema)
    }),

    // batched per-group scoring: N charts scored in ONE shuffle via a
    // custom Aggregator (GroupScore)
    "q_group_outstanding" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(graft.score.GroupScore.outstanding1(col("o_totalprice")).as("outstanding1"),
          count(lit(1)).as("n"))
    }),

    // full pipeline: profile → enumerate → execute → score → top-k
    "q_recommend_charts" -> ((s, dir) => {
      val customer = Tables.customer(s, dir)
      val (df, profile) = Profiler.profile(customer)
      val rec = Recommender.recommend(df, profile, s)
      val rows = rec.visList.map(r =>
        Row(r.chartType, r.score, r.signature, r.channels.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString("; ")))
      val schema = StructType(Seq(
        StructField("chart_type", StringType), StructField("score", DoubleType),
        StructField("signature", StringType), StructField("channels", StringType)))
      s.createDataFrame(java.util.List.of(rows: _*), schema)
    })
  )
}
