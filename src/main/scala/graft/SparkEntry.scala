package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's declared query;
  * `oracleSql` gives the DuckDB-equivalent SQL. Every query is
  * value-exact against its oracle — including all seven ML fits, whose
  * oracles replay the deterministic fits bit-for-bit ([[TsneOracle]],
  * [[UmapOracle]], [[LdaOracle]], and the builders in [[MLQueries]]) —
  * except q_recommend_charts (the full search pipeline), which keeps a
  * rows-only check with its exact signature+score set pinned by
  * RecommendGoldenSpec on the gate fixture.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ MLQueries.queries ++ ExtQueries.queries ++
      AssemblyQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ MLQueries.oracles ++ ExtQueries.oracles ++
      AssemblyQueries.oracles
}
