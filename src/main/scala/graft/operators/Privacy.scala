package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit — the re-identification risk check a dataset
  * release runs AFTER redaction ([[ExtQueries]]' PII scrub removes
  * direct identifiers; this measures the QUASI-identifiers that
  * remain): every combination of the quasi columns is an equivalence
  * class, and a class smaller than `k` means its members are
  * re-identifiable by joining those columns against an outside table
  * (Sweeney 2002 — public-domain definition).
  *
  * Scale shape: one combinable groupBy on the quasi columns (the only
  * corpus-sized shuffle), then either a single-row reduce (the audit
  * summary) or a size-ascending TakeOrdered listing (the worst
  * offenders). Exact longs end to end.
  */
object Privacy {

  /** ONE summary row: (n_classes, n_violating, rows_at_risk,
    * min_class_size) — release-gate material: k-anonymous iff
    * n_violating = 0. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, "need quasi columns and k >= 1")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("__cs"))
      .agg(count(lit(1)).as("n_classes"),
        coalesce(sum(when(col("__cs") < k, 1L).otherwise(0L)), lit(0L))
          .as("n_violating"),
        coalesce(sum(when(col("__cs") < k, col("__cs")).otherwise(0L)), lit(0L))
          .as("rows_at_risk"),
        min(col("__cs")).as("min_class_size"))
  }

  /** The violating classes themselves, smallest (riskiest) first,
    * capped at `top` rows — ordered (size ASC, quasi values ASC) so
    * the cut is total. */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String], k: Long,
                           top: Int = 100): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1 && top >= 1,
      "need quasi columns, k >= 1, top >= 1")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("class_size"))
      .where(col("class_size") < k)
      .orderBy(col("class_size").asc +: quasiCols.map(col(_).asc): _*)
      .limit(top)
  }
}
