package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chart-side aggregations — the only true aggregations in the
  * reference (SURVEY §2.4) — plus the `aggr` op the reference declares
  * but never implements (T.py:188, its generators are `pass`): with
  * Spark these are all one shuffle with map-side partial aggregation.
  */
object ChartAssembly {

  /** sum_bar group-agg: per-group sums of the numeric y columns,
    * renamed `SUM(col)` (search.py:949-965). */
  def sumBar(df: DataFrame, x: String, ys: Seq[String]): DataFrame = {
    val aggs = ys.map(c => sum(col(c)).as(s"SUM($c)"))
    df.groupBy(col(x)).agg(aggs.head, aggs.tail: _*)
  }

  /** count_bar group-agg: per-group row count → `COUNT`
    * (search.py:966-971). */
  def countBar(df: DataFrame, x: String): DataFrame =
    df.groupBy(col(x)).agg(count(lit(1)).as("COUNT"))

  /** The reserved `aggr` basic T, first-class: arbitrary aggregate over
    * group keys (cost 100 in the reference's model, L.py:10). */
  def aggr(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
}
