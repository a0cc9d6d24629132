package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join: attach to every left row the payload
  * of the latest right row with the same key and time ≤ the left row's
  * time. The event-stream enrichment join (trade↔quote, event↔model
  * checkpoint, click↔last purchase) that plain equi-joins can't
  * express and range joins explode on.
  *
  * Implementation is the union + running-last window, not a range
  * join: tag right rows side=0 and left rows side=1, union, then
  * `last(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY time,
  * side, tie ROWS UNBOUNDED PRECEDING)` and keep the left rows. One
  * shuffle on the key plus a per-key sort — O(n log n) per key and
  * streamable, where Spark's own range-join plan for `r.t <= l.t`
  * degenerates to a per-key cartesian filter (O(n·m)). Ties at equal
  * time resolve right-before-left (side 0 < 1: a right row AT the left
  * row's time is visible, "at or before"), and among right rows by
  * `tieCol` — pass a unique id so the picked payload is deterministic
  * under any partitioning.
  *
  * Skew ceiling is the hottest key (one partition sorts that key's
  * rows); salt upstream if a single key exceeds a partition's memory —
  * the window itself spills per ExternalAppendOnlyUnsafeRowArray.
  */
object AsofJoin {

  /** Null right-side payload values are skipped, not attached: the
    * window takes the last NON-NULL payload, so a null-valued right row
    * is invisible and the search continues further back. With several
    * `payloadCols`, each column independently takes its own last
    * non-null — columns may therefore come from different right rows
    * when rights carry nulls in different columns (pack a struct
    * payload when row-atomicity matters).
    *
    * @param left      probe rows (kept, one output row each)
    * @param right      reference rows whose `payloadCols` are attached
    * @param keyCols    equality keys present in both frames
    * @param timeCol    ordering column present in both frames
    * @param tieCol     unique-per-row column present in both frames
    *                   (deterministic tie-break at equal time)
    * @param payloadCols right-side columns to carry; emitted as
    *                    `asof_<name>` (null when no prior right row)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               timeCol: String, tieCol: String,
               payloadCols: Seq[String]): DataFrame =
    asofCore(left, right, keyCols, timeCol, tieCol, payloadCols,
      forward = false)

  /** FORWARD as-of: attach the EARLIEST right row with time ≥ the left
    * row's time (pandas `merge_asof direction='forward'`) — the
    * attribution shape (click ↔ next purchase, alert ↔ next deploy,
    * event ↔ next model checkpoint). Same union + running window plan
    * as [[asofJoin]], mirrored: left rows sort BEFORE right rows at
    * equal time (a right row AT the left time is visible — "at or
    * after") and each payload takes its first non-null over
    * [current, unbounded following]. Identical one-shuffle scale shape
    * and skew ceiling. */
  def asofJoinForward(left: DataFrame, right: DataFrame,
                      keyCols: Seq[String], timeCol: String, tieCol: String,
                      payloadCols: Seq[String]): DataFrame =
    asofCore(left, right, keyCols, timeCol, tieCol, payloadCols,
      forward = true)

  /** NEAREST as-of (pandas `merge_asof direction='nearest'`): per left
    * row, the backward and forward candidates race on |Δt| and the
    * closer right ROW's payloads win; ties go backward (the pandas
    * rule). Composition of the two directional cores, each carrying
    * ONE packed struct payload (every payload column plus the right
    * row's time), joined back on `tieCol` (unique per left row by
    * contract) — two key shuffles + one tie-keyed join of two
    * one-row-per-left frames, nothing new at scale.
    *
    * ROW-ATOMIC, unlike the directional variants' per-column
    * independence: because each arm's window ranges over the packed
    * struct (non-null for every right row), the arm picks the
    * IMMEDIATELY adjacent right row — null payload FIELDS ride along
    * inside it rather than re-opening the search per column, and the
    * |Δt| race then picks a whole row. This is exactly pandas
    * `merge_asof direction='nearest'` on null-bearing payloads, where
    * the per-column composition could assemble its answer from a
    * different right row per column (AsofJoinSpec pins a case where
    * the two disagree). */
  def asofJoinNearest(left: DataFrame, right: DataFrame,
                      keyCols: Seq[String], timeCol: String, tieCol: String,
                      payloadCols: Seq[String]): DataFrame = {
    require(!payloadCols.contains(timeCol),
      "timeCol is carried automatically; don't list it in payloadCols")
    require(left.schema(timeCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"asofJoinNearest needs a NUMERIC timeCol for the |Δt| race " +
        s"(got ${left.schema(timeCol).dataType}); the directional " +
        "variants accept any orderable type")
    val rowPay = "__asof_nearest_row"
    require(!left.columns.contains(rowPay) && !right.columns.contains(rowPay),
      s"'$rowPay' is reserved by asofJoinNearest")
    // pack payloads + the right row's own time into ONE struct so each
    // directional window picks whole rows (struct is never null on a
    // right row, even when every payload field is)
    val packed = right.withColumn(rowPay,
      struct((payloadCols :+ timeCol).map(col): _*))
    val back = asofCore(left, packed, keyCols, timeCol, tieCol, Seq(rowPay),
      forward = false)
    val fwd = asofCore(left, packed, keyCols, timeCol, tieCol, Seq(rowPay),
        forward = true)
      .select(col(tieCol).as("__tie"), col(s"asof_$rowPay").as("__f_row"))
    val joined = back.join(fwd, back(tieCol) === fwd("__tie"))
    val bRow = col(s"asof_$rowPay"); val fRow = col("__f_row")
    val bT = bRow.getField(timeCol); val fT = fRow.getField(timeCol)
    // backward wins when forward is absent OR |Δt| ties or is larger
    val pickBack = fT.isNull ||
      (bT.isNotNull && (col(timeCol) - bT) <= (fT - col(timeCol)))
    joined.select((left.columns.toSeq.map(c => back(c)) ++
      payloadCols.map(p =>
        when(pickBack, bRow.getField(p)).otherwise(fRow.getField(p))
          .as(s"asof_$p"))): _*)
  }

  private def asofCore(left: DataFrame, right: DataFrame,
                       keyCols: Seq[String], timeCol: String, tieCol: String,
                       payloadCols: Seq[String], forward: Boolean): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!payloadCols.exists(p => leftCols.contains(s"asof_$p")),
      "left frame already has an asof_* output column")
    require(!leftCols.exists(c => c == "__side" || c.startsWith("__pay_")),
      "left frame uses a reserved internal column name (__side / __pay_*)")
    val meta = keyCols :+ timeCol :+ tieCol
    // name matching must follow Spark's (default case-insensitive)
    // resolution, or a differently-cased key would be emitted twice —
    // once resolved, once as the null filler — and break the union
    val metaLower = meta.map(_.toLowerCase)
    // backward: right(0) before left(1) at equal time, last over the
    // preceding frame — "at or before". Forward mirrors both: left(0)
    // before right(1), first over the following frame — "at or after".
    val (leftTag, rightTag) = if (forward) (0, 1) else (1, 0)
    val l = left.select(
      (leftCols.map(col) :+ lit(leftTag).as("__side")) ++
        payloadCols.map(p => lit(null).cast(right.schema(p).dataType).as(s"__pay_$p")): _*)
    val r = right.select(
      (meta.map(col) ++
        leftCols.filterNot(c => metaLower.contains(c.toLowerCase))
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(rightTag).as("__side")) ++
        payloadCols.map(p => col(p).as(s"__pay_$p")): _*)
    val wBase = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc, col(tieCol).asc)
    val w = if (forward)
      wBase.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    else wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def pick(p: String) =
      if (forward) first(col(s"__pay_$p"), ignoreNulls = true).over(w)
      else last(col(s"__pay_$p"), ignoreNulls = true).over(w)
    l.unionByName(r.select(l.columns.toSeq.map(c => col(c)): _*))
      .select((leftCols.map(col) :+ col("__side")) ++
        payloadCols.map(p => pick(p).as(s"asof_$p")): _*)
      .where(col("__side") === leftTag)
      .drop("__side")
  }
}
