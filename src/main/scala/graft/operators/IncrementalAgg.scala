package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keep a materialized keyed
  * (count, sum) aggregate current under a CDC changelog WITHOUT
  * rescanning the base table (classic incremental view maintenance;
  * the batch-materialization sibling of [[ChangeApply]], which
  * maintains the ROWS where this maintains the AGGREGATE).
  *
  * Change rows carry op 'I' (insert, contributes +1/+value) or 'D'
  * (delete, −1/−value); an update is its D(old) + I(new) pair — the
  * standard changelog decomposition, so any upstream that can feed
  * [[ChangeApply]] can feed this. COUNT and SUM are the
  * self-maintainable aggregates (each delta composes by addition);
  * MIN/MAX are deliberately out of scope — a delete can invalidate
  * them without a base rescan, which is the thing this operator
  * exists to avoid.
  *
  * At 100 TB this is the difference between touching the day's
  * changes and re-aggregating the corpus: the only shuffle keyed by
  * group is over the CHANGELOG (≪ base by assumption), and the merge
  * is one key-equi full-outer join against the existing aggregate —
  * AQE broadcasts the delta side when it is small, which is the
  * common case. Groups whose maintained count reaches EXACTLY zero
  * vanish; groups born in the changelog appear — both from the same
  * coalesce-and-filter, no special-casing. A count gone NEGATIVE is
  * a contract violation (over-deletion — a corrupt changelog) and
  * raises loudly rather than vanishing like a legitimate group death,
  * matching the repo's loud-failure convention ([[RangeJoin]],
  * [[Anomaly]], robustScale).
  *
  * Exactness: pass an exact-typed value column (the gate query uses
  * DECIMAL(18,2), the repo's money convention) and the maintained sum
  * is bit-equal to a full recompute regardless of partitioning —
  * that equivalence IS the oracle contract (q_incr_agg_maintain's
  * DuckDB side recomputes from scratch).
  *
  * @param baseAgg existing aggregate: key columns + `nCol` + `sumCol`
  * @param changes changelog: key columns + `valCol` + `opCol` ('I'/'D')
  * @return same schema as `baseAgg`, maintained
  */
object IncrementalAgg {

  def maintainSumCount(baseAgg: DataFrame, changes: DataFrame,
                       keys: Seq[String], valCol: String, opCol: String,
                       nCol: String = "n_rows", sumCol: String = "total")
      : DataFrame = {
    require(keys.nonEmpty, "at least one group key required")
    val sign = when(col(opCol) === "I", lit(1L))
      .when(col(opCol) === "D", lit(-1L))
    val delta = changes
      .withColumn("__sign", coalesce(sign, lit(0L)))
      .where(col("__sign") =!= 0L) // unknown ops contribute nothing, loudly droppable upstream
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__sign")).as("__dn"),
        sum(col("__sign") * col(valCol)).as("__dsum"))
    baseAgg.join(delta, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col(nCol), lit(0L)) + coalesce(col("__dn"), lit(0L))).as(nCol),
        (coalesce(col(sumCol), lit(0)) + coalesce(col("__dsum"), lit(0))).as(sumCol)): _*)
      // n == 0 is a legitimate group death (drop); n < 0 is
      // over-deletion and must not vanish silently
      .where(when(col(nCol) < 0, raise_error(concat(lit(
          "maintainSumCount: maintained count went negative (corrupt changelog, over-deleted group); n="),
          col(nCol).cast("string"))).cast("boolean"))
        .otherwise(col(nCol) > 0))
  }
}
