package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout clustering: Z-order (Morton) interleave of several
  * integer dimensions, the multi-column locality move behind
  * data-skipping at scale (Delta/Iceberg `OPTIMIZE ZORDER`). Rows
  * sorted by the interleaved key keep multi-dimensional neighbors in
  * the same file/row-group, so per-file min/max statistics prune scans
  * for predicates on ANY of the clustered columns — a lexicographic
  * sort only prunes its leading column.
  *
  * [[mortonKey]] is a pure bit-arithmetic expression tree (shift, and,
  * or — whole-stage-codegen friendly, bit-exact in any engine);
  * [[zorderLayout]] applies it: one range shuffle on the key + an
  * in-partition sort, the exact pre-write shape (`repartitionByRange`
  * sizes output files, the sort makes row-group stats tight). Nothing
  * here is driver-bound, so the layout pass scales with the shuffle.
  */
object Layout {

  /** Morton interleave of `cols` (non-negative integers; the low
    * `bits` bits of each are used — bucket or scale beforehand).
    * Bit b of dimension j lands at position `b·k + j`, so the result
    * fits a signed long for `bits · cols.size ≤ 63`.
    */
  def mortonKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "mortonKey needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits=$bits × ${cols.size} dims must fit a signed long (≤ 63 bits)")
    val k = cols.size
    val terms = for {
      b <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * k + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` for writing: append `z_key` = [[mortonKey]] over
    * `dims`, range-partition on it into `partitions` output slices
    * (0 → the session shuffle-partition default) and sort within each
    * partition — `df.write` after this produces z-ordered files with
    * tight per-file min/max on every clustered dimension. */
  def zorderLayout(df: DataFrame, dims: Seq[Column], bits: Int,
                   partitions: Int = 0): DataFrame = {
    require(!df.columns.contains("z_key"), "z_key is the reserved output column name")
    val keyed = df.withColumn("z_key", mortonKey(dims, bits))
    val parts = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    keyed.repartitionByRange(parts, col("z_key"))
      .sortWithinPartitions(col("z_key"))
  }
}
