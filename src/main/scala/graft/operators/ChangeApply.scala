package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog application (CDC apply / MERGE INTO semantics) without a
  * table format: fold a stream of keyed upserts and deletes into a
  * snapshot, keeping the highest-version change per key — the
  * compaction step every incremental-ingestion pipeline needs (crawl
  * re-fetches, document re-scores, takedown deletions) when the lake
  * is plain parquet.
  *
  * Contract: `changes` carries (keys..., versionCol ≥ 0, opCol ∈
  * {'U','D'}, payload...); the snapshot carries (keys..., payload...)
  * and is treated as version −1 upserts. Per key the winner is the
  * max (version, op, payload...) struct — so a same-version tie
  * resolves 'U' over 'D' deterministically, though callers should keep
  * (key, version) unique. A winning 'D' removes the key; inserts need
  * no join at all (a change key absent from the snapshot simply wins
  * its group).
  *
  * Scale shape: union → ONE key shuffle into a map-side-combinable
  * `max(struct(...))` aggregate — no window (a per-key ROW_NUMBER
  * would funnel nothing here since keys are fine-grained, but the agg
  * spelling additionally pre-combines per map task, so a key updated
  * a million times in one batch ships one row per task, not a million
  * into one reducer). Re-applying the same changelog is idempotent
  * (spec-pinned).
  *
  * @return (keys..., payload..., last_version)
  */
object ChangeApply {

  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
                     keyCols: Seq[String], versionCol: String,
                     opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val payload = snapshot.columns.filterNot(keyCols.contains).toSeq
    require(payload.nonEmpty, "snapshot needs at least one payload column")
    val missing = (keyCols ++ payload ++ Seq(versionCol, opCol))
      .filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changes is missing columns: $missing")

    val verType = changes.schema(versionCol).dataType
    val snap = snapshot.select(
      (keyCols ++ payload).map(col) :+
        lit(-1L).cast(verType).as(versionCol) :+ lit("U").as(opCol): _*)
    val chg = changes.select(
      (keyCols ++ payload).map(col) :+ col(versionCol) :+ col(opCol): _*)

    val winner = struct(
      (col(versionCol) +: col(opCol) +: payload.map(col)): _*)
    snap.unionByName(chg)
      .groupBy(keyCols.map(col): _*)
      .agg(max(winner).as("__w"))
      .where(col(s"__w.$opCol") =!= "D")
      .select(keyCols.map(col) ++
        payload.map(c => col(s"__w.$c").as(c)) :+
        col(s"__w.$versionCol").as("last_version"): _*)
  }

  /** Changelog compaction: the latest change per key (deletes KEPT as
    * tombstones — downstream appliers still need them). Same one-agg
    * shape; use it to shrink a long changelog before [[applyChangelog]]
    * or before shipping between pipeline stages. */
  def compactChangelog(changes: DataFrame, keyCols: Seq[String],
                       versionCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val payload = changes.columns
      .filterNot((keyCols :+ versionCol :+ opCol).contains).toSeq
    val winner = struct(
      (col(versionCol) +: col(opCol) +: payload.map(col)): _*)
    changes.groupBy(keyCols.map(col): _*)
      .agg(max(winner).as("__w"))
      .select(keyCols.map(col) ++
        (versionCol +: opCol +: payload).map(c => col(s"__w.$c").as(c)): _*)
  }
}
