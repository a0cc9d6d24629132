package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming demo over the `events` stream shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference has no streaming at all (SURVEY §2.12) — this is the
  * explicitly-separate extension: tumbling-window counts with a
  * watermark, expressed once and runnable over either a batch frame or
  * a stream (same logical plan, which is the point of Structured
  * Streaming).
  */
object StreamingDemo {

  /** Sessionization event / state records (top-level for Encoders). */
  final case class Ev(userId: Long, tsMillis: Long)
  final case class Sess(userId: Long, start: Long, end: Long, n: Long)

  /** A surviving line segment from [[dedupLinesStream]]. */
  final case class Seg(docId: Long, pos: Int, line: String)

  /** A per-bucket verdict from [[minhashDedupStream]]: `dupOf` is the
    * best previously-seen near-duplicate found in this LSH bucket
    * (-1 / sim -1.0 when none reached τ). */
  final case class NearDupVerdict(docId: Long, band: Int, dupOf: Long, sim: Double)
  /** Bucket-state entry: a previously-seen document's full signature. */
  final case class SigEntry(docId: Long, sig: Seq[Long])
  /** One banded signature row keyed by its LSH bucket. */
  final case class BandRow(docId: Long, band: Int, key: String, sig: Seq[Long])

  /** One changelog row / emitted current-state row for
    * [[applyChangelogStream]]. */
  final case class ChgRow(key: Long, version: Long, op: String, payload: String)
  /** Per-key winner state: the highest (version, op, payload) change. */
  final case class ChangeState(version: Long, op: String, payload: String)

  /** One typed event for [[funnelStream]]. */
  final case class FunnelEvent(user: Long, ts: Long, etype: String)
  /** Per-user funnel progress: last event time seen (the staleness
    * gate), current depth, anchor + deepest-step times. */
  final case class FunnelState(lastTs: Long, depth: Int, tFirst: Long, tLast: Long)
  /** Emitted funnel-progress row (same shape as the batch operator). */
  final case class FunnelRow(user_id: Long, steps_completed: Long,
                             t_first: Long, t_last: Long)

  /** One typed event for [[anomalyStream]]. */
  final case class AnomalyEvent(key: String, ts: Long, id: Long, value: Double)
  /** Per-key rolling state: the admission frontier (last applied
    * (ts, id)) and the trailing quantized-value window. */
  final case class AnomalyState(lastTs: Long, lastId: Long, window: Seq[Long])
  /** Emitted anomaly row (same shape as the batch operator's output). */
  final case class AnomalyRow(event_id: Long, event_type: String, ts_us: Long,
                              value: Double, zq: Double, is_anomaly: Long)

  /** One typed event for [[budgetAdmitStream]]. */
  final case class BudgetEvent(id: Long, ts: Long, w: Long)
  /** The admission gate's scalar state: the (ts, id) frontier (staleness/
    * redelivery gate) and the running weight over EVERY event seen. */
  final case class BudgetState(lastTs: Long, lastId: Long, cum: Long)
  /** Emitted admitted row (same shape as selectByBudget's cut). */
  final case class BudgetRow(event_id: Long, ts_us: Long, weight: Long,
                             cum_weight: Long)

  /** One changelog delta for [[maintainAggStream]] ('I' adds, 'D'
    * subtracts; value in exact integer units). */
  final case class AggDeltaRow(key: Long, version: Long, op: String, value: Long)
  /** Per-key maintained aggregate + the last applied version. */
  final case class AggMaintState(lastVersion: Long, n: Long, total: Long)
  /** Emitted maintained-aggregate row. */
  final case class AggRow(key: Long, last_version: Long, n_rows: Long, total: Long)

  /** Tumbling 1-hour window aggregation with a 10-minute watermark.
    * Works on a streaming OR batch frame with columns (ts, event_type,
    * value). */
  def windowedCounts(events: DataFrame): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", "10 minutes") else events
    withWm
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,3)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Continuous drift monitoring, stage 1 — the streaming twin of
    * [[graft.operators.Drift.windowedTvDrift]], split the
    * [[minhashDedupStream]]/[[collapseNearDupVerdicts]] way: THIS is
    * the streaming stage (watermarked tumbling-window per-category
    * counts, append mode — a window's counts emit exactly once, when
    * the watermark passes its end), and
    * [[graft.operators.Drift.tvCollapse]] is the batch collapse over
    * the output table (counts → per-window TV against the broadcast
    * reference — the IDENTICAL exact-integer arithmetic the batch
    * operator runs, so stream∘collapse == batch by construction;
    * spec-pinned in StreamingSpec).
    *
    * State is the window aggregation's own (|windows in flight| ×
    * |categories| longs, watermark-bounded); epoch-aligned tumbling
    * windows make `unix_micros(window.start)` equal the batch
    * operator's integer-div bucketing for any divisor of the window
    * width. Rows with null ts are dropped (no event time, no window).
    */
  def tvDriftWindowCounts(events: DataFrame, tsCol: String = "ts",
                          catCol: String = "event_type",
                          windowDur: String = "1 day",
                          watermark: String = "10 minutes"): DataFrame = {
    val picked = events
      .select(col(tsCol).cast("timestamp").as("__ts"),
        col(catCol).cast("string").as("c"))
      .where(col("__ts").isNotNull)
    val withWm = if (events.isStreaming)
      picked.withWatermark("__ts", watermark) else picked
    withWm
      .groupBy(window(col("__ts"), windowDur).as("w"), col("c"))
      .agg(count(lit(1)).as("ca"))
      .select(unix_micros(col("w.start")).as("window_start"),
        col("c"), col("ca"))
  }

  /** Per-user sessionization with custom state
    * (KeyValueGroupedDataset.flatMapGroupsWithState): a session closes
    * after `gapMinutes` of inactivity; emits (user_id, session_start,
    * session_end, n_events). Demonstrates the arbitrary-state API the
    * window aggregation can't express.
    *
    * Streaming runs use an EVENT-TIME TIMEOUT bound to a `gapMinutes`
    * watermark: when the watermark passes a session's end + gap, the
    * session is emitted and its state freed — without this (round-8
    * fix) a user who went quiet forever never emitted their final
    * session and the state store grew without bound. Rows with a null
    * user_id or null/uncastable ts are dropped (they have no
    * session identity; the gate oracle's contract assumes non-null
    * keys). */
  def sessionize(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                 gapMinutes: Int = 30): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val picked = events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"))
      .where(col("user_id").isNotNull && col("ts").isNotNull)
    val wm = if (events.isStreaming)
      picked.withWatermark("ts", s"$gapMinutes minutes") else picked
    sessionizeCore(
      wm.withColumn("ts_ms", unix_millis(col("ts"))),
      gapMinutes, events.isStreaming)
  }

  /** [[sessionize]] over a pre-extracted epoch-milliseconds column
    * (`user_id`, `ts_ms`) — the integer-exact entry point for sources
    * whose native timestamps don't survive a cast (the nanosecond
    * events table), and the one the oracle-gated batch twin uses. */
  def sessionizeMillis(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val picked = events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts_ms").cast("long").as("ts_ms"),
        timestamp_millis(col("ts_ms").cast("long")).as("__ts"))
      .where(col("user_id").isNotNull && col("ts_ms").isNotNull)
    val wm = if (events.isStreaming)
      picked.withWatermark("__ts", s"$gapMinutes minutes") else picked
    sessionizeCore(wm, gapMinutes, events.isStreaming)
  }

  /** @param input frame with `user_id` (long) and `ts_ms` (long) —
    *               plus, when streaming, the WATERMARK-TAGGED event
    *               time column it was derived from. The grouping is on
    *               untyped rows deliberately: an object-typed `.map`
    *               before the stateful operator re-serializes the
    *               frame and STRIPS the watermark column, and the
    *               analyzer then rejects EventTimeTimeout outright
    *               ("Event-time timeout not supported without
    *               watermark") — caught by the RocksDB sessionize spec
    *               in round 12; every earlier spec exercised only the
    *               batch path, which never reaches that check. */
  private def sessionizeCore(input: DataFrame,
                             gapMinutes: Int, streaming: Boolean): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = input.sparkSession
    import spark.implicits._

    val gapMs = gapMinutes * 60000L

    def fn(userId: Long, rows: Iterator[org.apache.spark.sql.Row],
           state: GroupState[Sess]): Iterator[Sess] = {
      if (streaming && state.hasTimedOut) {
        // watermark passed end + gap: the session is definitively over
        val out = state.getOption.toSeq
        state.remove()
        return out.iterator
      }
      val sorted = rows.map(r =>
        Ev(r.getAs[Long]("user_id"), r.getAs[Long]("ts_ms")))
        .toSeq.sortBy(_.tsMillis)
      var cur = state.getOption
      val closed = Seq.newBuilder[Sess]
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.tsMillis - s.end <= gapMs =>
            // min/max, not blind overwrite: a cross-batch late event
            // (e.tsMillis < s.end, still within gap) must extend the
            // session backwards-in-start at most — never move `end`
            // backwards, which corrupted start/end ordering and could
            // spuriously split the next on-time event off. No-op for
            // the sorted batch path (e >= s.end always), so the
            // oracle-gated batch twin is unchanged.
            cur = Some(s.copy(start = math.min(s.start, e.tsMillis),
              end = math.max(s.end, e.tsMillis), n = s.n + 1))
          case Some(s) =>
            closed += s
            cur = Some(Sess(userId, e.tsMillis, e.tsMillis, 1))
          case None =>
            cur = Some(Sess(userId, e.tsMillis, e.tsMillis, 1))
        }
      }
      cur match {
        case Some(s) if !streaming => state.remove(); closed += s // batch: flush
        case Some(s) =>
          state.update(s)
          // fire once the watermark clears the inactivity gap; clamp
          // to the watermark (setTimeoutTimestamp rejects the past)
          state.setTimeoutTimestamp(
            math.max(s.end + gapMs, state.getCurrentWatermarkMs() + 1))
        case None =>
      }
      closed.result().iterator
    }

    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    input.groupByKey(_.getAs[Long]("user_id"))
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(fn)
      .toDF("user_id", "session_start_ms", "session_end_ms", "n_events")
  }

  /** Streaming exact dedup: drop rows whose `idCol` was already seen
    * within the watermark delay. State is bounded by the watermark (the
    * point of `dropDuplicatesWithinWatermark` vs plain dropDuplicates,
    * whose state grows forever on an unbounded stream) — the streaming
    * twin of [[graft.operators.Dedup.exactDedup]].
    *
    * Batch frames keep the EARLIEST-event-time row per id (row_number
    * over ts), not `dropDuplicates`' arbitrary first-seen row: the
    * deterministic pick is what makes the batch twin oracle-checkable,
    * and it matches the streaming path's first-arrival-wins whenever
    * replay order follows event time (the normal backfill case). Rows
    * tied on (id, ts) are still an arbitrary pick — give ids a unique
    * ts if exact replayability matters. */
  def dedupEvents(events: DataFrame, idCol: String = "event_id",
                  tsCol: String = "ts", delay: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(idCol)
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol)).orderBy(col(tsCol).asc)
      events.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
    }

  /** Streaming twin of [[graft.operators.PipelineOps.dedupLines]]'s
    * winner set: documents explode into (doc, pos, line) segments and
    * each DISTINCT line survives exactly once. First arrival wins;
    * ties inside one micro-batch break on the (doc, pos) total order,
    * so a single-batch replay emits exactly the batch winners. Emits
    * kept SEGMENTS rather than rebuilt documents — Structured
    * Streaming restricts a second stateful re-aggregation after
    * flatMapGroupsWithState, and the segment set is what a downstream
    * compaction joins back anyway (the batch operator's rebuild).
    *
    * State is one boolean per distinct line, NoTimeout: global dedup
    * memory is the operator's point. If the line universe outgrows the
    * state store, re-shard the store or restart from a batch re-dedup
    * — the bounded-state trade [[dedupEvents]] makes with its
    * watermark deliberately does not apply here, because a line's
    * duplicate can arrive arbitrarily late.
    *
    * Batch frames take the aggregate path (min-struct winner per
    * line, map-side combinable — no per-group iterators). */
  def dedupLinesStream(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text",
                       delim: String = "\n"): org.apache.spark.sql.Dataset[Seg] = {
    val session = docs.sparkSession
    import session.implicits._
    // Seg.docId is a primitive Long: a lossy cast from a string id
    // would deserialize null → NPE (streaming) or collapse every doc
    // into one null winner (batch) — reject non-integral ids up front
    val idType = docs.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType)
        .contains(idType),
      s"dedupLinesStream needs an integral $idCol (got $idType); " +
        "the batch PipelineOps.dedupLines accepts any id type")
    val quoted = java.util.regex.Pattern.quote(delim)
    val segs = docs.select(col(idCol).cast("long").as("docId"),
        posexplode(split(coalesce(col(textCol), lit("")), quoted))
          .as(Seq("pos", "line")))
      .as[Seg]
    if (docs.isStreaming) {
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      segs.groupByKey(_.line)
        .flatMapGroupsWithState[Boolean, Seg](
          OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, it, state) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator(it.minBy(s => (s.docId, s.pos)))
          }
        }
    } else {
      // (docId, pos) is unique, so the struct comparison never reaches
      // the line field — it rides along to avoid a recovery join
      segs.groupBy(md5(col("line")))
        .agg(min(struct(col("docId"), col("pos"), col("line"))).as("__w"))
        .select(col("__w.docId"), col("__w.pos"), col("__w.line"))
        .as[Seg]
    }
  }

  /** Streaming near-duplicate detection: MinHash-LSH dedup of a
    * continuous document stream against EVERYTHING seen before it —
    * the streaming sibling of [[graft.operators.Dedup.
    * minhashIncrementalPairs]], where the "corpus" is the stream's own
    * past (continuous crawl ingestion: each arriving page is checked
    * against all previously-crawled pages).
    *
    * Shape: signatures are ROW-LOCAL ([[graft.functions.MinhashSig]]),
    * so the stream needs no pre-aggregation; each document then fans
    * out to its `bands` LSH buckets and the per-bucket state
    * (flatMapGroupsWithState keyed by (band, bucket-slice)) holds the
    * signatures of every document that ever hit the bucket. An
    * arriving document is compared ONLY against its own buckets'
    * residents — exactly the candidate set the batch LSH join
    * produces — and emits one [[NearDupVerdict]] per band; collapse
    * per document with [[collapseNearDupVerdicts]]. First-arrival
    * wins; within one micro-batch, ties break by ascending id (the
    * deterministic stand-in for arrival order inside a batch).
    * Duplicates also join the bucket state, so transitive chains
    * (A≈B≈C with C∼B but C≁A) flag the way the batch pair graph's
    * connected components do.
    *
    * State: one signature list per OCCUPIED bucket, NoTimeout — like
    * [[dedupLinesStream]], global dedup memory is the operator's
    * point (a near-dup can arrive arbitrarily late). `maxBucket` is
    * the hot-bucket skew guard (the state-side analogue of
    * [[graft.operators.Dedup]]'s capBuckets): a bucket at capacity
    * stops ADMITTING new residents but still answers probes, so a
    * viral duplicate cluster costs bounded signature memory and its
    * members still pair through their other bands. Documents judged
    * past the cap leave an id-only TOMBSTONE (a [[SigEntry]] with an
    * empty signature, ~16 bytes vs ~8·numHashes for a resident) so
    * the redelivery present-check covers them too — a capped doc's
    * replay is discarded like any other, never re-judged or
    * re-emitted. Total state = `bands × (8·numHashes + ~16)` bytes
    * per admitted document (~2 KB/doc at the defaults) plus
    * `bands × ~16` bytes per capped document; past executor-heap
    * scale, run the
    * query with `spark.sql.streaming.stateStore.providerClass` set to
    * the RocksDB provider — state then lives off-heap/on-disk and the
    * per-bucket lists page in on probe, which is the 100 TB-stream
    * posture (the default HDFS-backed store keeps every bucket in
    * executor memory). The RocksDB round-trip of this state schema is
    * spec-verified (StreamingSpec "RocksDB state store").
    *
    * Batch frames run the identical per-bucket logic without state
    * (one group pass, ascending-id order) — value-parity with the
    * batch LSH candidate pairs is oracle-gated (q_dedup_stream_verdicts)
    * and the stream/batch twin equivalence is spec-pinned. */
  def minhashDedupStream(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text", numHashes: Int = 32,
                         bands: Int = 8, shingleSize: Int = 3,
                         tau: Double = 0.5, maxBucket: Int = 100000)
      : org.apache.spark.sql.Dataset[NearDupVerdict] = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    val session = docs.sparkSession
    import session.implicits._
    val idType = docs.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType)
        .contains(idType),
      s"minhashDedupStream needs an integral $idCol (got $idType)")
    val r = numHashes / bands
    val sigCol = graft.functions.MinhashSig.signature(
      graft.functions.TextFunctions.wordShingles(col(textCol), shingleSize),
      numHashes)
    // same shingle-less precondition as Dedup.minhashSignatures: a
    // token-count filter, not isNotNull(sig) (which would re-evaluate
    // the md5 chain below the projection)
    val sigs = docs
      .where(size(graft.functions.TextFunctions.tokens(col(textCol))) >= shingleSize)
      .select(col(idCol).cast("long").as("docId"), sigCol.as("sig"))
      .as[(Long, Seq[Long])]
    val bandRows = sigs.flatMap { case (id, s) =>
      (0 until bands).map { b =>
        BandRow(id, b, s"$b:${s.slice(b * r, (b + 1) * r).mkString(",")}", s)
      }
    }
    def simOf(a: Seq[Long], b: Seq[Long]): Double = {
      var k = 0; var eq = 0
      while (k < numHashes) { if (a(k) == b(k)) eq += 1; k += 1 }
      eq.toDouble / numHashes
    }
    // shared by the stateful and batch paths: judge `rows` (ascending
    // id) against the bucket's residents, admitting each doc as it goes
    def judge(rows: Seq[BandRow], seen0: Seq[SigEntry])
        : (Seq[NearDupVerdict], Seq[SigEntry]) = {
      // ArrayBuffer, not `seen :+ e` per row: an immutable append
      // copies the whole resident list each admission, turning the
      // hot-bucket scenario maxBucket exists for into O(m²) copying
      val seen = scala.collection.mutable.ArrayBuffer.from(seen0)
      // residents = entries carrying a signature; a capped bucket also
      // holds id-only TOMBSTONES (sig = empty) for documents judged
      // after the cap, so the redelivery check below covers EVERY
      // previously-judged document, not just admitted residents —
      // without them, a doc rejected at the cap would be invisible to
      // the present-check and an at-least-once replay would be
      // re-judged (and re-emit a verdict) as if new
      var residents = seen.count(_.sig.nonEmpty)
      val out = rows.sortBy(_.docId).map { row =>
        var bestId = -1L; var bestSim = -1.0; var present = false
        seen.foreach { e =>
          // an entry with the SAME id means this row is a REDELIVERY
          // of an already-judged document (at-least-once sources
          // replay) — it must not be re-admitted, and its whole
          // verdict must be discarded below: comparing a replay
          // against residents admitted AFTER its first arrival would
          // flag the ORIGINAL as dup-of-its-own-later-duplicate (and
          // collapse's max-sim merge would make that permanent),
          // violating both idempotency and the oracle's a.id < b.id
          // pair direction
          if (e.docId == row.docId) present = true
          else if (e.sig.nonEmpty) {
            val sim = simOf(e.sig, row.sig)
            if (sim >= tau && (sim > bestSim || (sim == bestSim && e.docId < bestId)))
              { bestId = e.docId; bestSim = sim }
          }
        }
        if (present) NearDupVerdict(row.docId, row.band, -1L, -1.0)
        else {
          if (residents < maxBucket) {
            seen += SigEntry(row.docId, row.sig); residents += 1
          } else {
            // cap reached: record the id alone (no signature — ~16
            // bytes vs ~8·numHashes) so a replay of this doc is still
            // recognized as already-judged; it never answers probes
            seen += SigEntry(row.docId, Seq.empty)
          }
          NearDupVerdict(row.docId, row.band, bestId, bestSim)
        }
      }
      (out, seen.toSeq)
    }
    if (docs.isStreaming) {
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      bandRows.groupByKey(_.key)
        .flatMapGroupsWithState[Seq[SigEntry], NearDupVerdict](
          OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, it, state) =>
          val (out, seen) = judge(it.toSeq, state.getOption.getOrElse(Seq.empty))
          state.update(seen)
          out.iterator
        }
    } else {
      bandRows.groupByKey(_.key).flatMapGroups { (_, it) =>
        judge(it.toSeq, Seq.empty)._1.iterator
      }
    }
  }

  /** Continuous CDC apply — the streaming twin of
    * [[graft.operators.ChangeApply]]: per-key state holds the winning
    * (version, op, payload) change seen so far, and a trigger emits
    * the key's NEW current row only when the winner changes. The same
    * total order as the batch operator's `max(struct(version, op,
    * payload))` decides the winner, so:
    *
    *  - out-of-order delivery is safe — a late lower-version change
    *    never overwrites and never emits;
    *  - at-least-once redelivery is idempotent — replaying the current
    *    winner compares equal and emits nothing;
    *  - same-version ties resolve 'U' over 'D' ('U' > 'D' in the
    *    binary string order BOTH engines use; payloads in the gate
    *    fixture are ASCII, where UTF-16 and UTF-8 byte orders agree).
    *
    * Deletes emit as 'D' tombstone rows (downstream needs them);
    * the last emission per key therefore always equals the batch
    * operator's winner for that key (spec-pinned across micro-batch
    * splits, arrival orders, and a redelivered changelog). State is
    * one ~(8+8+op+payload)-byte entry per live key, NoTimeout by
    * design (a CDC state IS the table); past heap, the RocksDB
    * provider holds it off-heap like the near-dedup's bucket state.
    *
    * Batch frames run the identical fold with no prior state — one
    * winner row per key, oracle-gated (q_changelog_stream_state). */
  def applyChangelogStream(changes: DataFrame, keyCol: String = "key",
                           versionCol: String = "version", opCol: String = "op",
                           payloadCol: String = "payload")
      : org.apache.spark.sql.Dataset[ChgRow] = {
    val session = changes.sparkSession
    import session.implicits._
    val typed = changes.select(col(keyCol).cast("long").as("key"),
        col(versionCol).cast("long").as("version"),
        col(opCol).cast("string").as("op"),
        coalesce(col(payloadCol).cast("string"), lit("")).as("payload"))
      .as[ChgRow]
    val ord = Ordering.Tuple3[Long, String, String]
    def keyOf(s: ChangeState) = (s.version, s.op, s.payload)
    // fold a batch of rows for one key over the prior winner; emit the
    // new current row iff the winner moved
    def fold(key: Long, rows: Iterator[ChgRow], prior: Option[ChangeState])
        : (Option[ChgRow], Option[ChangeState]) = {
      var cur = prior
      rows.foreach { r =>
        val cand = ChangeState(r.version, r.op, r.payload)
        if (cur.forall(c => ord.gt(keyOf(cand), keyOf(c)))) cur = Some(cand)
      }
      val moved = (cur, prior) match {
        case (Some(c), Some(p)) => keyOf(c) != keyOf(p)
        case (Some(_), None) => true
        case _ => false
      }
      (if (moved) cur.map(c => ChgRow(key, c.version, c.op, c.payload)) else None,
        cur)
    }
    if (changes.isStreaming) {
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      typed.groupByKey(_.key)
        .flatMapGroupsWithState[ChangeState, ChgRow](
          OutputMode.Append, GroupStateTimeout.NoTimeout) { (key, it, state) =>
          val (out, cur) = fold(key, it, state.getOption)
          cur.foreach(state.update)
          out.iterator
        }
    } else {
      typed.groupByKey(_.key).flatMapGroups { (key, it) =>
        fold(key, it, None)._1.iterator
      }
    }
  }

  /** Lazy per-key fold over a key-clustered, in-key-sorted iterator
    * (the repartition + sortWithinPartitions shape): `step` may emit a
    * row per event, `flush` may emit one when a key's run ends. At
    * most two rows are ever pending — no key's history or output is
    * materialized, so a low-cardinality key costs O(per-key state),
    * not O(corpus/|keys|) task heap. Shared by the stream twins'
    * batch arms (the round-12 advice finding: their groupByKey +
    * rows.toSeq folds buffered a key's entire batch history — exactly
    * the unbounded single-key funnel the batch operators' spillable
    * key-partitioned windows were designed to avoid). */
  private def sortedRunFold[R, K, S, O](rows: Iterator[R])(keyOf: R => K)(
      init: S)(step: (S, R) => (S, Option[O]))(
      flush: (K, S) => Option[O]): Iterator[O] =
    new Iterator[O] {
      private var out: List[O] = Nil
      private var key: K = null.asInstanceOf[K]
      private var open = false
      private var st: S = init
      private def fill(): Unit = {
        while (out.isEmpty && rows.hasNext) {
          val r = rows.next()
          val k = keyOf(r)
          if (!open || k != key) {
            if (open) out = flush(key, st).toList
            key = k; st = init; open = true
          }
          val (s2, o) = step(st, r); st = s2
          out = out ::: o.toList
        }
        if (out.isEmpty && !rows.hasNext && open) {
          out = flush(key, st).toList; open = false
        }
      }
      override def hasNext: Boolean = { fill(); out.nonEmpty }
      override def next(): O = { fill(); val h = out.head; out = out.tail; h }
    }

  /** Continuous anomaly detection — the streaming twin of
    * [[graft.operators.Anomaly]]: live per-key rolling z-scores, which
    * is the shape anomaly detection actually deploys in (a metrics
    * stream scored as it arrives). Per-key state holds the trailing
    * `windowN` QUANTIZED values plus the admission frontier; each
    * admitted event past warm-up emits its z-row immediately.
    *
    * Same exactness design as the batch operator (2^-10 quantization,
    * integer moments, the √(2^52/N) bound raised loudly) and the same
    * replay-safety family as the other round-12 twins — here the
    * frontier is the full (ts, id) pair, because admitting a replayed
    * event would DOUBLE-INSERT its value into the window (the funnel's
    * ts-only frontier suffices there since re-anchoring is a no-op;
    * a rolling window has no such luck). So:
    *
    *  - at-least-once redelivery is idempotent — a replay compares
    *    ≤ (lastTs, lastId) and is skipped;
    *  - distinct same-ts events admit in sorted (ts, id) order, the
    *    batch operator's exact window order;
    *  - in-order delivery ⇒ stream rows == batch operator rows
    *    (oracle-gated through the batch arm, which shares
    *    q_events_anomaly's oracle verbatim).
    *
    * State: windowN longs + two frontier longs per key, NoTimeout
    * (~200 B/key at N=24 — key cardinality bounds memory; RocksDB
    * round-trip spec-pinned like the rest of the family). */
  def anomalyStream(events: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, valCol: String, windowN: Int = 24,
                    thresh: Double = 3.0)
      : org.apache.spark.sql.Dataset[AnomalyRow] = {
    require(windowN >= 2 && windowN <= 4096,
      s"windowN in [2, 4096] (the exactness bound), got $windowN")
    val session = events.sparkSession
    import session.implicits._
    val vMax = math.sqrt(4503599627370496.0 / windowN).toLong // 2^52/N
    val typed = events.select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("long").as("ts"), col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("value"))
      // value NULLs dropped like the batch operator (they neither
      // score nor occupy a window slot); without the filter the
      // non-nullable encoder field would NPE
      .where(col("key").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .as[AnomalyEvent]
    val nD = windowN.toDouble
    // one event against the prior state: admit iff past the (ts, id)
    // frontier, slide the window, emit a z-row past warm-up — shared
    // VERBATIM by the streaming fold and the batch arm
    def step(st: AnomalyState, r: AnomalyEvent): (AnomalyState, Option[AnomalyRow]) =
      if (r.ts > st.lastTs || (r.ts == st.lastTs && r.id > st.lastId)) {
        val v = math.floor(r.value * 1024.0).toLong
        require(math.abs(v) <= vMax,
          "anomalyStream: |value|·1024 exceeds the exactness bound — scale the column down")
        val win = (st.window :+ v).takeRight(windowN)
        val st2 = AnomalyState(r.ts, r.id, win)
        if (win.length == windowN) {
          var s = 0L; var q = 0L
          win.foreach { x => s += x; q += x * x } // exact long moments
          val varNum = q.toDouble - (s.toDouble * s.toDouble) / nD
          val z = if (varNum <= 0.0) 0.0
                  else (v.toDouble - s.toDouble / nD) / math.sqrt(varNum / nD)
          (st2, Some(AnomalyRow(r.id, r.key, r.ts, r.value, z,
            if (math.abs(z) > thresh) 1L else 0L)))
        } else (st2, None)
      } else (st, None)
    val empty = AnomalyState(Long.MinValue, Long.MinValue, Vector.empty)
    if (events.isStreaming) {
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      typed.groupByKey(_.key)
        .flatMapGroupsWithState[AnomalyState, AnomalyRow](
          OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, it, state) =>
          var st = state.getOption.getOrElse(empty)
          // per-TRIGGER buffer only (bounded by the micro-batch, not
          // the key's history — the batch arm never takes this path)
          val out = it.toSeq.sortBy(r => (r.ts, r.id)).flatMap { r =>
            val (s2, o) = step(st, r); st = s2; o
          }
          state.update(st)
          out.iterator
        }
    } else {
      // batch arm: the identical fold over an in-partition
      // (key, ts, id) sort — spillable, lazily folded; never a
      // per-key materialized Seq
      typed.repartition(col("key"))
        .sortWithinPartitions(col("key"), col("ts"), col("id"))
        .mapPartitions(it =>
          sortedRunFold(it)(_.key)(empty)(step)((_, _) => None))
    }
  }

  /** Continuous funnel analysis — the streaming twin of
    * [[graft.operators.Funnel]]: per-user state holds the greedy-first
    * progress (depth, anchor time, deepest-step time), and a trigger
    * emits the user's NEW progress row whenever the depth advances
    * (progressive output — the batch operator reports final depths,
    * the stream reports each advance as it happens, which is what a
    * live conversion dashboard consumes).
    *
    * Contract: the event log is per-user TIME-ORDERED across triggers
    * (the shape every event-log source provides); within a trigger
    * arrivals sort by ts. An event older than the newest one already
    * seen for its user is STALE and skipped — greedy-first cannot
    * retroactively re-anchor without replaying history, so late data
    * is dropped loudly-by-contract rather than silently producing a
    * different funnel than the batch op would. Consequences:
    *
    *  - in-order delivery ⇒ stream final state == batch operator
    *    output exactly (spec-pinned across micro-batch splits);
    *  - at-least-once redelivery is idempotent — a replayed event's
    *    ts compares ≤ lastTs and is skipped;
    *  - same-ts events cannot change the outcome (the strictly-after
    *    step rule, as in the batch operator), so the staleness gate
    *    uses strict `<` and keeps same-ts siblings admissible in
    *    their sorted order.
    *
    * State: one (lastTs, depth, tFirst, tLast) per user, NoTimeout
    * (a funnel can complete arbitrarily late; compose with
    * [[sessionizeCore]]-style timeouts upstream to bound cardinality
    * when user churn is unbounded). Batch frames run the identical
    * fold per user and emit the FINAL row only — value parity with
    * [[graft.operators.Funnel.funnel]] is oracle-gated
    * (q_funnel_stream_state reuses the funnel oracle verbatim). */
  def funnelStream(events: DataFrame, userCol: String, tsUsCol: String,
                   typeCol: String, steps: Seq[String], windowUs: Long)
      : org.apache.spark.sql.Dataset[FunnelRow] = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "steps must be non-empty and distinct")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val session = events.sparkSession
    import session.implicits._
    val n = steps.size
    val typed = events.select(col(userCol).cast("long").as("user"),
        col(tsUsCol).cast("long").as("ts"),
        col(typeCol).cast("string").as("etype"))
      .where(col("user").isNotNull && col("ts").isNotNull)
      .as[FunnelEvent]
    // one event against the prior state: advance greedy-first, emit
    // the progress row on each advance — shared by both arms (the
    // batch arm discards per-advance rows and flushes the final state)
    def step(st: FunnelState, r: FunnelEvent): (FunnelState, Option[FunnelRow]) =
      if (r.ts >= st.lastTs) { // strict < is stale; same-ts admissible
        if (st.depth == 0 && r.etype == steps.head) {
          val s2 = FunnelState(r.ts, 1, r.ts, r.ts)
          (s2, Some(FunnelRow(r.user, 1L, s2.tFirst, s2.tLast)))
        } else if (st.depth > 0 && st.depth < n && r.etype == steps(st.depth) &&
                   r.ts > st.tLast && r.ts - st.tLast <= windowUs) {
          val s2 = FunnelState(r.ts, st.depth + 1, st.tFirst, r.ts)
          (s2, Some(FunnelRow(r.user, s2.depth.toLong, s2.tFirst, s2.tLast)))
        } else (st.copy(lastTs = math.max(st.lastTs, r.ts)), None)
      } else (st, None)
    val empty = FunnelState(Long.MinValue, 0, 0L, 0L)
    if (events.isStreaming) {
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      typed.groupByKey(_.user)
        .flatMapGroupsWithState[FunnelState, FunnelRow](
          OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, it, state) =>
          var st = state.getOption.getOrElse(empty)
          // per-TRIGGER buffer only (bounded by the micro-batch)
          val out = it.toSeq.sortBy(r => (r.ts, r.etype)).flatMap { r =>
            val (s2, o) = step(st, r); st = s2; o
          }
          state.update(st)
          out.iterator
        }
    } else {
      // batch arm: final row per user only (the batch operator's
      // shape), via the in-partition (user, ts, etype) sort + lazy
      // fold — a user's last advance row equals the flush of their
      // final state (non-advance steps only move lastTs)
      typed.repartition(col("user"))
        .sortWithinPartitions(col("user"), col("ts"), col("etype"))
        .mapPartitions(it =>
          sortedRunFold(it)(_.user)(empty)(
            (st, r) => (step(st, r)._1, Option.empty[FunnelRow]))(
            (u, st) => if (st.depth > 0)
              Some(FunnelRow(u, st.depth.toLong, st.tFirst, st.tLast)) else None))
    }
  }

  /** Continuous budget admission — the streaming twin of
    * [[graft.operators.PipelineOps.selectByBudget]]'s prefix-cut rule,
    * completing the §2.13 order/selection family's streaming column: a
    * live ingest admits events in (event-time, id) order while the
    * INCLUSIVE running weight over every event seen stays within
    * `budget` — the quota/cap monitor ("stop admitting at N tokens
    * today"). The rule is selectByBudget's verbatim: the running total
    * accumulates ALL arrivals (admitted or not), a row is admitted iff
    * its inclusive total fits, and since weights are non-negative the
    * total is monotone — the admitted set is a strict PREFIX of the
    * order, never a knapsack back-fill.
    *
    * The batch arm DELEGATES to `selectByBudget` itself (score = −ts,
    * so (score DESC, id ASC) is exactly (ts ASC, id ASC)) — the
    * distributed-prefix-sum operator IS the batch deployment, and the
    * stream==batch spec therefore pins the sequential fold against the
    * distributed cut, the strongest twin contract in this file.
    *
    * Scale, stated plainly: the state is ONE global scalar (frontier +
    * running weight), so the streaming arm runs on a single synthetic
    * key — a global admission gate is inherently a sequential monitor
    * (every quota counter is), and its throughput bound is one state
    * fold per event, not a Spark shuffle. Corpus-scale SELECTION under
    * a budget belongs on the batch operator's distributed prefix sum;
    * this is the live-cap deployment of the same contract.
    *
    * Contract mirrors the family: events per-source time-ordered across
    * triggers, within a trigger sorted by (ts, id); an event at or
    * behind the frontier is stale/redelivered and skipped (idempotent
    * at-least-once); negative or NULL weights raise loudly, exactly as
    * the batch operator does — and so do NULL ids/timestamps (a
    * budget admission with an unaddressable or untimed row is a
    * pipeline bug; silently shedding it in one arm only would break
    * the stream==batch contract at the boundary), IN BOTH ARMS via
    * the one shared guarded projection. */
  def budgetAdmitStream(events: DataFrame, idCol: String, tsUsCol: String,
                        weightCol: String, budget: Long)
      : org.apache.spark.sql.Dataset[BudgetRow] = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val session = events.sparkSession
    import session.implicits._
    def nonNullLong(c: String) =
      when(col(c).isNull, raise_error(lit(
          s"budgetAdmitStream: NULL '$c' — ids/timestamps must be non-null"))
          .cast("long"))
        .otherwise(col(c).cast("long"))
    // Long.MinValue is doubly unusable: it IS the stream arm's frontier
    // sentinel (such an event would read as already-seen) and its
    // negation overflows to itself in the batch arm's −ts score — a
    // real timestamp is never within a hair of Long.MinValue µs, so
    // raise rather than carve out sentinel arithmetic
    def tsGuard(c: String) =
      when(col(c) === Long.MinValue, raise_error(lit(
          s"budgetAdmitStream: '$c' = Long.MinValue is reserved (frontier sentinel / negation overflow)"))
          .cast("long"))
        .otherwise(nonNullLong(c))
    // the ONE guarded projection both arms consume — the stream==batch
    // contract starts at identical admissible inputs
    val guarded = events.select(
      nonNullLong(idCol).as("event_id"),
      tsGuard(tsUsCol).as("ts_us"),
      when(col(weightCol) < 0 || col(weightCol).isNull,
          raise_error(concat(
            lit(s"budgetAdmitStream: negative or NULL '$weightCol' at $idCol="),
            coalesce(col(idCol).cast("string"), lit("NULL")))).cast("long"))
        .otherwise(col(weightCol).cast("long")).as("weight"))
    if (events.isStreaming) {
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      val typed = guarded.select(col("event_id").as("id"),
          col("ts_us").as("ts"), col("weight").as("w"))
        .as[BudgetEvent]
      def step(st: BudgetState, r: BudgetEvent): (BudgetState, Option[BudgetRow]) =
        if (r.ts > st.lastTs || (r.ts == st.lastTs && r.id > st.lastId)) {
          val cum = st.cum + r.w
          (BudgetState(r.ts, r.id, cum),
            if (cum <= budget) Some(BudgetRow(r.id, r.ts, r.w, cum)) else None)
        } else (st, None)
      val empty = BudgetState(Long.MinValue, Long.MinValue, 0L)
      typed.groupByKey(_ => 0)
        .flatMapGroupsWithState[BudgetState, BudgetRow](
          OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, it, state) =>
          var st = state.getOption.getOrElse(empty)
          // per-TRIGGER buffer only (bounded by the micro-batch)
          val out = it.toSeq.sortBy(r => (r.ts, r.id)).flatMap { r =>
            val (s2, o) = step(st, r); st = s2; o
          }
          state.update(st)
          out.iterator
        }
    } else {
      // batch arm: the anchor operator itself — selectByBudget's
      // distributed prefix sum pointed at (ts ASC, id ASC) via the
      // negated-score spelling over the SAME guarded projection; its
      // strict-prefix cut applies unchanged (its own weight raise is
      // unreachable behind the shared guard)
      graft.operators.PipelineOps.selectByBudget(
          guarded.withColumn("__neg_ts", -col("ts_us")),
          "event_id", "weight", "__neg_ts", budget)
        .select(col("event_id"), col("ts_us"), col("weight"), col("cum_weight"))
        .as[BudgetRow]
    }
  }

  /** Continuous incremental aggregate maintenance — the streaming twin
    * of [[graft.operators.IncrementalAgg]]: per-key state holds the
    * maintained (count, sum) plus the last applied version, and a
    * trigger emits the key's NEW aggregate row only when it moved.
    * This closes the CDC family square: [[ChangeApply]] /
    * [[applyChangelogStream]] maintain the ROWS, [[graft.operators.IncrementalAgg]] /
    * this maintain the AGGREGATE.
    *
    * Contract: the changelog is a per-key VERSION-ORDERED log (the
    * Kafka-compaction shape every CDC source provides). Deltas apply
    * in (version, op, value) order and ONLY when version exceeds the
    * last applied one, so:
    *
    *  - at-least-once redelivery is idempotent — a replayed version
    *    compares ≤ lastVersion and is skipped, never double-applied
    *    (the non-idempotent failure mode naïve delta streams have);
    *  - out-of-order delivery within a trigger is sorted; a version
    *    arriving triggers late is skipped (stale by contract);
    *  - a count reaching zero still emits (n_rows = 0) so downstream
    *    can delete the group — the batch operator drops it instead,
    *    which is the materialized-view convention there.
    *
    * State: one (lastVersion, n, total) triple per key, NoTimeout (the
    * aggregate IS the table, like [[applyChangelogStream]]); values are
    * exact integer units (scale decimals upstream — the batch twin
    * takes DECIMAL directly). Batch frames run the identical fold per
    * key from empty state; value parity with the batch operator and
    * the DuckDB recompute is oracle-gated (q_incr_agg_stream_state). */
  def maintainAggStream(changes: DataFrame, keyCol: String = "key",
                        versionCol: String = "version", opCol: String = "op",
                        valueCol: String = "value")
      : org.apache.spark.sql.Dataset[AggRow] = {
    val session = changes.sparkSession
    import session.implicits._
    val typed = changes.select(col(keyCol).cast("long").as("key"),
        col(versionCol).cast("long").as("version"),
        col(opCol).cast("string").as("op"),
        col(valueCol).cast("long").as("value"))
      .where(col("op").isin("I", "D")) // unknown ops contribute nothing
      .as[AggDeltaRow]
    // one delta against the prior state: apply iff the version
    // strictly advances — shared by both arms; rows must arrive
    // sorted by the full (version, op, value) key (version alone
    // would leave same-version duplicates ambiguous — the
    // strictly-greater rule then deterministically applies only the
    // FIRST of a same-version group)
    def step(st: AggMaintState, r: AggDeltaRow): (AggMaintState, Option[AggRow]) =
      if (r.version > st.lastVersion) {
        val s = if (r.op == "I") 1L else -1L
        (AggMaintState(r.version, st.n + s, st.total + s * r.value), None)
      } else (st, None)
    val empty = AggMaintState(Long.MinValue, 0L, 0L)
    if (changes.isStreaming) {
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      typed.groupByKey(_.key)
        .flatMapGroupsWithState[AggMaintState, AggRow](
          OutputMode.Append, GroupStateTimeout.NoTimeout) { (key, it, state) =>
          val prior = state.getOption
          var st = prior.getOrElse(empty)
          // per-TRIGGER buffer only (bounded by the micro-batch)
          it.toSeq.sortBy(r => (r.version, r.op, r.value)).foreach { r =>
            st = step(st, r)._1
          }
          // emit the key's new aggregate row only when it moved (or
          // on first sight of the key)
          val out = if (prior.isEmpty || !prior.contains(st))
            Some(AggRow(key, st.lastVersion, st.n, st.total)) else None
          state.update(st)
          out.iterator
        }
    } else {
      // batch arm: one row per key from empty state, via the
      // in-partition (key, version, op, value) sort + lazy fold —
      // never a per-key materialized Seq
      typed.repartition(col("key"))
        .sortWithinPartitions(col("key"), col("version"), col("op"), col("value"))
        .mapPartitions(it =>
          sortedRunFold(it)(_.key)(empty)(step)(
            (k, st) => Some(AggRow(k, st.lastVersion, st.n, st.total))))
    }
  }

  /** Collapse [[minhashDedupStream]]'s per-band verdicts to one row
    * per document: `(doc_id, is_dup, dup_of, best_sim)` — dup iff ANY
    * bucket found a τ-similar predecessor; the winner is the highest
    * similarity, ties to the smallest predecessor id. A batch
    * DataFrame op (run it on the memory sink / output table). */
  def collapseNearDupVerdicts(verdicts: DataFrame): DataFrame =
    verdicts
      .groupBy(col("docId"))
      .agg(max(struct(col("sim").as("s"), (-col("dupOf")).as("negDup"))).as("__w"))
      .select(col("docId").as("doc_id"),
        when(col("__w.s") >= 0, 1L).otherwise(0L).as("is_dup"),
        when(col("__w.s") >= 0, -col("__w.negDup")).otherwise(-1L).as("dup_of"),
        when(col("__w.s") >= 0, col("__w.s")).otherwise(-1.0).as("best_sim"))

  /** Drive the streaming query synchronously from a bounded source and
    * return the materialized result (memory sink). Used by tests and
    * the demo entry point: batch parquet → streaming plan → complete
    * output mode → collectable table. */
  def runOnce(spark: SparkSession, source: DataFrame, queryName: String): DataFrame = {
    val q = windowedCounts(source)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    // fail loudly on timeout — an unchecked false here would hand back
    // a silently-partial memory sink and leak the running query
    val finished = q.awaitTermination(120000)
    if (!finished) {
      q.stop()
      throw new IllegalStateException(
        s"streaming query '$queryName' did not finish within 120s")
    }
    spark.table(queryName)
  }
}
