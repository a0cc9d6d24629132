package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingDemo
import graft.operators.Multimodal

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("windowedCounts over a MemoryStream source (true streaming run)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData(
      (ts(0, 5), "click", 1.0), (ts(0, 25), "click", 2.0), (ts(0, 45), "view", 3.0),
      (ts(1, 10), "click", 4.0), (ts(1, 30), "view", 5.0))
    val source = mem.toDF().toDF("ts", "event_type", "value")
    val out = StreamingDemo.runOnce(spark, source, "stream_test_1")
      .select($"window_start", $"event_type", $"n_events", $"sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(out == Set(
      (ts(0, 0), "click", 2L, 3.0), (ts(0, 0), "view", 1L, 3.0),
      (ts(1, 0), "click", 1L, 4.0), (ts(1, 0), "view", 1L, 5.0)))
  }

  test("batch and streaming window plans agree") {
    val batch = Seq(
      (ts(0, 5), "click", 1.0), (ts(0, 25), "click", 2.0), (ts(1, 10), "view", 4.0))
      .toDF("ts", "event_type", "value")
    val r = StreamingDemo.windowedCounts(batch)
      .select($"window_start", $"event_type", $"n_events").as[(Timestamp, String, Long)]
      .collect().toSet
    assert(r == Set((ts(0, 0), "click", 2L), (ts(1, 0), "view", 1L)))
  }

  test("tvDriftWindowCounts ∘ tvCollapse == batch windowedTvDrift (stream and batch arms)") {
    implicit val sqlCtx = spark.sqlContext
    // two hour-long windows with different category mixes
    val rows = Seq(
      (ts(0, 5), "click"), (ts(0, 15), "click"), (ts(0, 25), "view"),
      (ts(1, 10), "view"), (ts(1, 20), "view"), (ts(1, 30), "purchase"))
    val ref = Seq(("click", 3L), ("view", 2L), ("purchase", 1L))
      .toDF("category", "n")
    // batch oracle arm: the micros-bucketed batch operator
    val batchDf = rows.toDF("ts", "event_type")
      .select(unix_micros($"ts").as("ts_us"), $"event_type")
    val expected = graft.operators.Drift
      .windowedTvDrift(batchDf, "ts_us", "event_type", 3600000000L, ref)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(expected.size == 2 && expected.forall(_._3 > 0.0))
    // batch arm of the streaming stage through the shared collapse
    val batchCounts = StreamingDemo.tvDriftWindowCounts(
      rows.toDF("ts", "event_type"), windowDur = "1 hour")
    val viaBatchArm = graft.operators.Drift.tvCollapse(batchCounts, ref)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(viaBatchArm == expected, "batch arm + collapse must equal the batch operator")
    // true streaming arm, two micro-batches
    val mem = MemoryStream[(Timestamp, String)]
    val q = StreamingDemo.tvDriftWindowCounts(
        mem.toDF().toDF("ts", "event_type"), windowDur = "1 hour")
      .writeStream.outputMode("complete").format("memory")
      .queryName("tv_drift_stream_test").start()
    try {
      mem.addData(rows.take(3): _*); q.processAllAvailable()
      mem.addData(rows.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    val viaStream = graft.operators.Drift
      .tvCollapse(spark.table("tv_drift_stream_test"), ref)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(viaStream == expected, "stream counts + collapse must equal the batch operator")
  }

  test("tvDriftWindowCounts ∘ diversityCollapse == batch windowedDiversity (one streaming stage feeds both monitors)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts(0, 5), "click"), (ts(0, 15), "click"), (ts(0, 25), "view"),
      (ts(1, 10), "view"), (ts(1, 20), "view"), (ts(1, 30), "purchase"))
    val batchDf = rows.toDF("ts", "event_type")
      .select(unix_micros($"ts").as("ts_us"), $"event_type")
    val expected = graft.operators.PipelineOps
      .windowedDiversity(batchDf, "ts_us", "event_type", 3600000000L)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // window 0: {click:2, view:1} -> 1 - 5/9 = 4/9; window 1:
    // {view:2, purchase:1} -> 4/9 too
    assert(expected.map(r => (r._2, r._3, r._4)) ==
      Seq((3L, 2L, 4.0 / 9), (3L, 2L, 4.0 / 9)))
    val mem = MemoryStream[(Timestamp, String)]
    val q = StreamingDemo.tvDriftWindowCounts(
        mem.toDF().toDF("ts", "event_type"), windowDur = "1 hour")
      .writeStream.outputMode("complete").format("memory")
      .queryName("diversity_stream_test").start()
    try {
      mem.addData(rows.take(3): _*); q.processAllAvailable()
      mem.addData(rows.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    val viaStream = graft.operators.PipelineOps
      .diversityCollapse(spark.table("diversity_stream_test"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(viaStream == expected,
      "the SAME streamed count table must collapse to the batch diversity series")
  }

  test("dedupEvents drops watermark-window duplicates on a true stream") {
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    mem.addData(
      (1L, ts(0, 5), 1.0), (1L, ts(0, 6), 1.0), (2L, ts(0, 7), 2.0),
      (2L, ts(0, 8), 2.0), (3L, ts(0, 9), 3.0))
    val src = mem.toDF().toDF("event_id", "ts", "value")
    val q = StreamingDemo.dedupEvents(src)
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream_test").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val ids = spark.table("dedup_stream_test").select($"event_id").as[Long].collect()
    assert(ids.sorted.toSeq == Seq(1L, 2L, 3L))
    // batch twin: same logical result through the non-streaming branch
    val batch = Seq((1L, ts(0, 5), 1.0), (1L, ts(0, 6), 1.0), (2L, ts(0, 7), 2.0))
      .toDF("event_id", "ts", "value")
    assert(StreamingDemo.dedupEvents(batch).count() == 2)
  }

  test("dedupLinesStream: first arrival wins across micro-batches; agrees with the batch winner set") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDemo.dedupLinesStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("lines_stream_test").start()
    try {
      mem.addData((1L, "a\nb"), (2L, "b\nc"))
      q.processAllAvailable()
      mem.addData((3L, "c\nd"), (4L, "a\nd"))  // only d is new, and doc 3 beats doc 4
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("lines_stream_test")
      .as[(Long, Int, String)].collect().toSet
    assert(out == Set((1L, 0, "a"), (1L, 1, "b"), (2L, 1, "c"), (3L, 1, "d")))
    // batch twin on the full input: arrival order here follows doc id,
    // so the winner sets must coincide exactly
    val batch = Seq((1L, "a\nb"), (2L, "b\nc"), (3L, "c\nd"), (4L, "a\nd"))
      .toDF("doc_id", "text")
    val bw = StreamingDemo.dedupLinesStream(batch).collect()
      .map(s => (s.docId, s.pos, s.line)).toSet
    assert(bw == out)
    // and the winners are exactly dedupLines' kept positions
    val kept = graft.operators.PipelineOps.dedupLines(batch, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(r => (r._1, r._2)).toMap
    assert(kept == Map(1L -> "a\nb", 2L -> "c", 3L -> "d", 4L -> ""))
  }

  test("budgetAdmitStream: strict-prefix admission across micro-batches == the batch selectByBudget arm; redelivery idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)] // (event_id, ts_us, weight)
    val q = StreamingDemo.budgetAdmitStream(
        mem.toDF().toDF("event_id", "ts_us", "weight"),
        "event_id", "ts_us", "weight", budget = 100L)
      .writeStream.outputMode("append").format("memory")
      .queryName("budget_stream_test").start()
    try {
      mem.addData((1L, 10L, 40L), (2L, 20L, 30L))   // cum 40, 70 — both in
      q.processAllAvailable()
      mem.addData((2L, 20L, 30L),                    // redelivery: stale, skipped
        (3L, 30L, 50L),                              // cum 120 > 100 — gate closed
        (4L, 40L, 5L))                               // would fit alone, but strict prefix
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("budget_stream_test")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 10L, 40L, 40L), (2L, 20L, 30L, 70L)),
      s"strict prefix + idempotent redelivery: $out")
    // the batch arm — selectByBudget's distributed prefix sum at
    // (ts ASC, id ASC) — must produce the identical cut (the sequential
    // fold pinned against the distributed operator)
    val batch = Seq((1L, 10L, 40L), (2L, 20L, 30L), (3L, 30L, 50L), (4L, 40L, 5L))
      .toDF("event_id", "ts_us", "weight")
    val viaBatch = StreamingDemo.budgetAdmitStream(batch,
        "event_id", "ts_us", "weight", budget = 100L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaBatch == out)
    // loud raises in the shared guarded projection: negative weight,
    // and NULL id/ts (one arm silently shedding what the other counts
    // would break the twin contract at the budget boundary)
    val e = intercept[Exception] {
      StreamingDemo.budgetAdmitStream(
        Seq((1L, 10L, -4L)).toDF("event_id", "ts_us", "weight"),
        "event_id", "ts_us", "weight", budget = 100L).collect()
    }
    assert(causeMessages(e).exists(_.contains("negative")),
      causeMessages(e).mkString("|"))
    val eNull = intercept[Exception] {
      StreamingDemo.budgetAdmitStream(
        Seq((Some(1L), None: Option[Long], Some(4L)))
          .toDF("event_id", "ts_us", "weight"),
        "event_id", "ts_us", "weight", budget = 100L).collect()
    }
    assert(causeMessages(eNull).exists(_.contains("NULL 'ts_us'")),
      causeMessages(eNull).mkString("|"))
  }

  test("sessionizeMillis: 30-min gap splits sessions, counts and bounds exact") {
    val evs = Seq(
      (1L, 0L), (1L, 60000L),      // session A: two events a minute apart
      (1L, 3000000L),              // gap 2940s > 1800s → session B
      (2L, 5L))                    // other user: singleton session
      .toDF("user_id", "ts_ms")
    val out = StreamingDemo.sessionizeMillis(evs, gapMinutes = 30)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, 60000L, 2L), (1L, 3000000L, 3000000L, 1L), (2L, 5L, 5L, 1L)))
  }

  test("sessionize (timestamp) and sessionizeMillis agree on the same events") {
    val rows = Seq((1L, ts(0, 1)), (1L, ts(0, 5)), (1L, ts(9, 0)), (7L, ts(2, 2)))
    val viaTs = StreamingDemo.sessionize(rows.toDF("user_id", "ts"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaMs = StreamingDemo.sessionizeMillis(
      rows.map { case (u, t) => (u, t.getTime) }.toDF("user_id", "ts_ms"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaTs == viaMs && viaTs.size == 3)
  }

  test("dedupEvents batch path keeps the earliest-ts row per id, deterministically") {
    val batch = Seq(
      (1L, 10L, "late"), (1L, 5L, "early"),
      (2L, 7L, "only"))
      .toDF("event_id", "ts", "tag")
    val kept = StreamingDemo.dedupEvents(batch, "event_id", "ts")
      .select($"event_id", $"tag").as[(Long, String)].collect().toSet
    assert(kept == Set((1L, "early"), (2L, "only")))
  }

  test("cleanStream: fingerprint dedup + quality gate on a true stream") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.CorpusPipeline
    implicit val sqlCtx = spark.sqlContext
    val good = (1 to 30).map(i => if (i % 5 == 0) "the" else s"token$i").mkString(" ") +
      " and of this stream is about spark"
    val mem = MemoryStream[(Long, Timestamp, String)]
    mem.addData(
      (1L, ts(0, 1), good),
      (2L, ts(0, 2), good),                      // exact dup (different id) → dropped
      (3L, ts(0, 3), "@@@@ 1111 $$$$"))          // junk → quality gate
    val src = mem.toDF().toDF("doc_id", "ts", "text")
    val q = CorpusPipeline.cleanStream(src, "text", "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("clean_stream_test").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val ids = spark.table("clean_stream_test").select($"doc_id").as[Long].collect()
    assert(ids.toSeq == Seq(1L))
  }

  test("gopher/c4 rule filters run unchanged on a true stream (stateless projections)") {
    // the round-8 rule sets are zero-shuffle row-local scans, so they
    // must be directly streamable — no watermark, no state store
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.CurationRules
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (1L, "A good first line stays.\nshort.\nAnother good line stays!"),
      (2L, "- bullet\n- bullet\nlorem ipsum here"))
    val src = mem.toDF().toDF("doc_id", "text")
    val q1 = CurationRules.c4Clean(src, "doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("c4_stream_test").trigger(Trigger.AvailableNow()).start()
    val q2 = CurationRules.gopherSignals(src, "doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("gopher_stream_test").trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000); q2.awaitTermination(120000)
    val c4 = spark.table("c4_stream_test")
      .select($"doc_id", $"doc_kept").as[(Long, Long)].collect().toMap
    assert(c4 === Map(1L -> 1L, 2L -> 0L))
    val gopher = spark.table("gopher_stream_test")
      .select($"doc_id", $"bullet_line_frac").as[(Long, Double)].collect().toMap
    assert(gopher(2L) === 2.0 / 3.0)
  }

  test("multimodal frame sampling: one row per sampled frame, deterministic digests") {
    val docs = Seq((1L, "some media payload text"), (2L, "x")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
      Multimodal.attachFakeBinary(docs, "doc_id", "text"), "doc_id", everyNth = 10)
    val byDoc = frames.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    // n_frames = byte_len % 30 + 1 ⇒ doc1: 23%30+1=24 → frames 0,10,20 ⇒ 3
    assert(byDoc(1L) == 3L)
    assert(byDoc(2L) == 1L)
    val d1 = frames.where($"doc_id" === 1 && $"frame_idx" === 0).select("frame_digest").as[String].head()
    val d2 = frames.where($"doc_id" === 2 && $"frame_idx" === 0).select("frame_digest").as[String].head()
    assert(d1 != d2 && d1.length == 64)
  }

  test("multimodal resize + feature extraction: deterministic, batch-shaped") {
    val docs = Seq((1L, "some media payload"), (2L, "other payload")).toDF("doc_id", "text")
    val media = Multimodal.attachFakeBinary(docs, "doc_id", "text")
    val resized = Multimodal.resize(media, "doc_id", 224, 224)
    assert(resized.columns.toSeq == Seq("doc_id", "media_type", "media", "width", "height"))
    assert(resized.select("width").as[Long].collect().forall(_ == 224L))
    // distinct targets yield distinct fake payloads; same target is stable
    val a = resized.where($"doc_id" === 1).select("media").as[Array[Byte]].head()
    val b = Multimodal.resize(media, "doc_id", 64, 64)
      .where($"doc_id" === 1).select("media").as[Array[Byte]].head()
    assert(!a.sameElements(b))

    val feats = Multimodal.extractFeatures(media, "doc_id")
    assert(feats.columns.toSeq == "doc_id" +: (0 until 8).map(i => s"f$i"))
    val row1 = feats.where($"doc_id" === 1).collect().head
    assert((1 to 8).map(row1.getDouble).forall(v => v >= 0.0 && v < 1.0))
    val again = Multimodal.extractFeatures(media, "doc_id").where($"doc_id" === 1).collect().head
    assert(row1 == again)
  }

  test("minhashDedupStream: near-dups flagged across micro-batches; stream == batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val docsSeq = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "an entirely different document about spark streaming state"),
      (3L, "the quick brown fox jumps over the lazy dog today"), // exact copy of 1
      (4L, "the quick brown fox jumps over the lazy dog"),       // near-dup of 1/3
      (5L, "yet another unrelated text with its own words only"))
    // split the stream MID-duplicate: 1 and 2 arrive in batch one, the
    // copies in batch two — the bucket state must carry doc 1 across
    // the micro-batch boundary
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDemo.minhashDedupStream(
        mem.toDF().toDF("doc_id", "text"), tau = 0.3)
      .writeStream.outputMode("append").format("memory")
      .queryName("minhash_stream_test").start()
    try {
      mem.addData(docsSeq.take(2): _*); q.processAllAvailable()
      mem.addData(docsSeq.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = StreamingDemo.collapseNearDupVerdicts(
        spark.table("minhash_stream_test"))
      .as[(Long, Long, Long, Double)].collect().toSet
    // arrival order here follows doc id, so the batch twin (one group
    // pass, ascending id) must produce the identical verdict set —
    // micro-batch boundaries must not matter
    val batch = StreamingDemo.collapseNearDupVerdicts(
        StreamingDemo.minhashDedupStream(
          docsSeq.toDF("doc_id", "text"), tau = 0.3).toDF())
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(streamed == batch)
    val byId = streamed.map(t => t._1 -> t).toMap
    assert(byId.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // firsts and unrelated docs are not dups
    assert(Seq(1L, 2L, 5L).forall(id => byId(id) == ((id, 0L, -1L, -1.0))))
    // the exact copy: identical signature, sim 1.0, predecessor 1
    assert(byId(3L) == ((3L, 1L, 1L, 1.0)))
    // the near-dup ties between the identical 1 and 3 → smallest id
    assert(byId(4L)._2 == 1L && byId(4L)._3 == 1L && byId(4L)._4 >= 0.3)
  }

  test("minhashDedupStream is idempotent under at-least-once redelivery") {
    // a source that replays a document (same id, same text) must not
    // flag the replay as a duplicate of its own first arrival — and
    // redelivery must not change anyone ELSE's verdict
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDemo.minhashDedupStream(
        mem.toDF().toDF("doc_id", "text"), tau = 0.3)
      .writeStream.outputMode("append").format("memory")
      .queryName("minhash_redelivery_test").start()
    try {
      mem.addData((1L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      // redeliver doc 1, then a genuine near-dup arrives
      mem.addData((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog today"))
      q.processAllAvailable()
      // the adversarial direction: redeliver doc 1 AFTER its own
      // near-duplicate was admitted — the replay must not compare
      // against doc 2 and flag the ORIGINAL dup-of-its-own-duplicate
      // (collapse's max-sim merge would make that permanent)
      mem.addData((1L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
    } finally q.stop()
    val out = StreamingDemo.collapseNearDupVerdicts(
        spark.table("minhash_redelivery_test"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out.contains((1L, 0L, -1L, -1.0)),
      s"a redelivered doc must never be flagged dup (of itself OR of a later duplicate): $out")
    val d2 = out.find(_._1 == 2L).get
    assert(d2._2 == 1L && d2._3 == 1L, s"doc 2 must still dup to doc 1: $d2")
  }

  test("a doc judged past the maxBucket cap is still redelivery-protected (id tombstone)") {
    // with maxBucket=1 the first resident saturates every bucket it
    // occupies; doc 2 is then judged AT the cap (dup-of-1, never
    // admitted). Its replay must be discarded by the present-check —
    // the id-only tombstone — not re-judged: a re-judge would emit a
    // second positive verdict row for an already-decided document
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog"
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDemo.minhashDedupStream(
        mem.toDF().toDF("doc_id", "text"), tau = 0.3, maxBucket = 1)
      .writeStream.outputMode("append").format("memory")
      .queryName("minhash_cap_tombstone_test").start()
    try {
      mem.addData((1L, base))
      q.processAllAvailable()
      mem.addData((2L, base + " today"))
      q.processAllAvailable()
      val positive = spark.table("minhash_cap_tombstone_test")
        .where($"docId" === 2L && $"dupOf" =!= -1L).count()
      assert(positive > 0, "doc 2 must judge dup-of-1 on first arrival")
      mem.addData((2L, base + " today")) // at-least-once replay of the CAPPED doc
      q.processAllAvailable()
      val afterReplay = spark.table("minhash_cap_tombstone_test")
        .where($"docId" === 2L && $"dupOf" =!= -1L).count()
      assert(afterReplay == positive,
        s"a capped doc's replay must be discarded, not re-judged ($positive -> $afterReplay)")
    } finally q.stop()
    val out = StreamingDemo.collapseNearDupVerdicts(
        spark.table("minhash_cap_tombstone_test"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out.contains((1L, 0L, -1L, -1.0)), s"doc 1 stays first: $out")
    val d2 = out.find(_._1 == 2L).get
    assert(d2._2 == 1L && d2._3 == 1L, s"doc 2 keeps its dup-of-1 verdict: $d2")
  }

  test("minhashDedupStream runs on the RocksDB state store (the past-heap posture)") {
    // the operator's scaladoc tells 100 TB-stream deployments to move
    // bucket state to RocksDB; this pins that the state schema
    // (Seq[SigEntry]) actually round-trips through that provider —
    // advice backed by a run, not an assertion
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, String)]
      val q = StreamingDemo.minhashDedupStream(
          mem.toDF().toDF("doc_id", "text"), tau = 0.3)
        .writeStream.outputMode("append").format("memory")
        .queryName("minhash_rocksdb_test").start()
      try {
        mem.addData((1L, "the quick brown fox jumps over the lazy dog"))
        q.processAllAvailable()
        mem.addData((2L, "the quick brown fox jumps over the lazy dog today"))
        q.processAllAvailable()
      } finally q.stop()
      val out = StreamingDemo.collapseNearDupVerdicts(
          spark.table("minhash_rocksdb_test"))
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(out.exists(t => t._1 == 2L && t._2 == 1L && t._3 == 1L),
        s"cross-batch dup must survive RocksDB state round-trip: $out")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("budgetAdmitStream's scalar gate state round-trips the RocksDB provider") {
    // same past-heap posture pin as the other stateful twins: the
    // (frontier, cum) BudgetState written in batch 1 must be read back
    // through RocksDB in batch 2 — the gate stays closed across batches
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Long, Long)]
      val q = StreamingDemo.budgetAdmitStream(
          mem.toDF().toDF("event_id", "ts_us", "weight"),
          "event_id", "ts_us", "weight", budget = 100L)
        .writeStream.outputMode("append").format("memory")
        .queryName("budget_rocksdb_test").start()
      try {
        mem.addData((1L, 10L, 80L))            // cum 80 — in
        q.processAllAvailable()
        mem.addData((2L, 20L, 30L),            // cum 110 — gate closes
          (3L, 30L, 5L))                       // strict prefix: still out
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.table("budget_rocksdb_test")
        .select($"event_id").as[Long].collect().toSet
      assert(out == Set(1L),
        s"batch-1 cum must survive the RocksDB round-trip and keep the gate closed: $out")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("near-dedup verdicts are replay-invariant under random redelivery (seeded, capped)") {
    // property form of the tombstone guarantee: a run WITH randomly
    // interleaved at-least-once replays (including docs judged past a
    // tiny maxBucket cap) must collapse to exactly the verdicts of the
    // clean run — one verdict per doc, none flipped by a replay
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(12021)
    val base = Seq("alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight nine ten",
      "the quick brown fox jumps over the lazy dog today")
    val docs = (1L to 30L).map { id =>
      val b = base((id % 3).toInt)
      // every third doc is a near-copy of an earlier one
      if (id > 3 && id % 3 == 0) (id, b + " tail" + (id / 3 % 2))
      else (id, b + s" unique$id marker$id")
    }
    def collapsed(feed: Seq[Seq[(Long, String)]], name: String) = {
      val mem = MemoryStream[(Long, String)]
      val q = StreamingDemo.minhashDedupStream(
          mem.toDF().toDF("doc_id", "text"), tau = 0.3, maxBucket = 2)
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try feed.foreach { chunk =>
        if (chunk.nonEmpty) { mem.addData(chunk: _*); q.processAllAvailable() }
      } finally q.stop()
      StreamingDemo.collapseNearDupVerdicts(spark.table(name))
        .as[(Long, Long, Long, Double)].collect().toSet
    }
    val clean = collapsed(docs.grouped(7).toSeq, "nd_replay_clean")
    // same arrival order, but after each batch replay a random sample
    // of everything already delivered (ascending id inside a batch is
    // the operator's intra-batch order; replays ride later batches)
    val withReplays = docs.grouped(7).toSeq.foldLeft(
        (Seq.empty[Seq[(Long, String)]], Seq.empty[(Long, String)])) {
      case ((batches, seen), chunk) =>
        val replay = rnd.shuffle(seen).take(rnd.nextInt(seen.size + 1))
        (batches :+ chunk :+ replay, seen ++ chunk)
    }._1
    val replayed = collapsed(withReplays, "nd_replay_dirty")
    assert(clean.map(_._1) == docs.map(_._1).toSet && clean.size == docs.size,
      "clean run must emit exactly one collapsed verdict per doc")
    assert(replayed == clean,
      s"replays changed verdicts:\nonly-clean=${clean.diff(replayed)}\nonly-replayed=${replayed.diff(clean)}")
  }

  test("image metadata decode runs on a true stream; rows equal the batch decoder's") {
    // the crawl-ingestion shape: real PNG payloads (plus one corrupt
    // row) arrive over two micro-batches; the typed-mapPartitions
    // streaming twin must produce exactly the batch decoder's rows —
    // stateless projection, no watermark, decode failures flagged
    import graft.operators.MediaCodecs
    implicit val sqlCtx = spark.sqlContext
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    val rendered = MediaCodecs.renderImages(ids, "doc_id")
      .select($"doc_id", $"media").as[(Long, Array[Byte])].collect()
    val corrupt = (99L, "not a png".getBytes("UTF-8"))
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = MediaCodecs.decodeImageMetadataStream(
        mem.toDF().toDF("doc_id", "media"), "doc_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("image_meta_stream_test").start()
    try {
      mem.addData(rendered.take(2).toSeq: _*)
      q.processAllAvailable()
      mem.addData(rendered.drop(2).toSeq :+ corrupt: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("image_meta_stream_test")
      .as[(Long, Boolean, Option[Long], Option[Long], Option[Long])]
      .collect().toSet
    val batch = MediaCodecs.decodeImageMetadata(
        (rendered :+ corrupt).toSeq.toDF("doc_id", "media"), "doc_id")
      .as[(Long, Boolean, Option[Long], Option[Long], Option[Long])]
      .collect().toSet
    assert(streamed == batch && streamed.size == 4,
      s"stream and batch decoders must agree: $streamed vs $batch")
    assert(streamed.exists(r => r._1 == 99L && !r._2),
      "corrupt bytes must flag decode_ok=false, not fail the stream")
  }

  test("dedupLinesStream's per-line state round-trips the RocksDB provider") {
    // completes the off-heap posture across ALL custom-state streaming
    // operators (near-dedup r11, sessionize r12): the cross-batch
    // suppression below only works if the Boolean first-arrival state
    // written in batch 1 is read back through RocksDB in batch 2
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, String)]
      val q = StreamingDemo.dedupLinesStream(mem.toDF().toDF("doc_id", "text"))
        .writeStream.outputMode("append").format("memory")
        .queryName("lines_rocksdb_test").start()
      try {
        mem.addData((1L, "a\nb"))
        q.processAllAvailable()
        mem.addData((2L, "b\nc")) // b must be suppressed by batch-1 state
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.table("lines_rocksdb_test")
        .as[(Long, Int, String)].collect().toSet
      assert(out == Set((1L, 0, "a"), (1L, 1, "b"), (2L, 1, "c")),
        s"first arrival must win across a RocksDB state round-trip: $out")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("sessionize Sess state round-trips the RocksDB provider; timeout emits the session") {
    // closes the streaming family's off-heap posture (r11 stretch):
    // the near-dedup's Seq[SigEntry] pin generalizes — this asserts
    // sessionizeCore's Sess state (a) survives a cross-batch RocksDB
    // round-trip (the batch-2 event must EXTEND the stored session,
    // not start a fresh one) and (b) is emitted + freed when the
    // event-time timeout fires after the watermark clears end + gap
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val t0 = 1700000000000L
      def tsAt(min: Long) = new Timestamp(t0 + min * 60000L)
      val mem = MemoryStream[(Long, Timestamp)]
      val q = StreamingDemo.sessionize(mem.toDF().toDF("user_id", "ts"))
        .writeStream.outputMode("append").format("memory")
        .queryName("sessionize_rocksdb_test").start()
      try {
        mem.addData((1L, tsAt(0)), (1L, tsAt(1)))
        q.processAllAvailable()
        mem.addData((1L, tsAt(10))) // within gap: extends the STORED session
        q.processAllAvailable()
        // user 2 far ahead advances the watermark past end+gap; the
        // extra batch lets the (next-batch-applied) watermark fire
        // the timeout
        mem.addData((2L, tsAt(120)))
        q.processAllAvailable()
        mem.addData((2L, tsAt(121)))
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.table("sessionize_rocksdb_test")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(out == Set((1L, t0, t0 + 10L * 60000L, 3L)),
        s"user 1's whole 3-event session must emit once on timeout: $out")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("minhashDedupStream rejects a non-integral id and bad band split") {
    val d = Seq(("a", "x y z")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException] {
      StreamingDemo.minhashDedupStream(d)
    }
    assertThrows[IllegalArgumentException] {
      StreamingDemo.minhashDedupStream(
        Seq((1L, "x y z")).toDF("doc_id", "text"), bands = 7)
    }
  }

  test("applyChangelogStream: stream == batch winner per key across splits and orders") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingDemo.ChgRow
    val chg = Seq(
      ChgRow(1L, 0L, "U", "a0"), ChgRow(1L, 2L, "U", "a2"), ChgRow(1L, 1L, "U", "a1"),
      ChgRow(2L, 0L, "U", "b0"), ChgRow(2L, 1L, "D", ""),
      ChgRow(3L, 0L, "U", "c0"),
      ChgRow(4L, 1L, "D", ""), ChgRow(4L, 2L, "U", "back"))
    val batch = StreamingDemo.applyChangelogStream(
        chg.toDF("key", "version", "op", "payload"))
      .collect().map(r => r.key -> r).toMap
    assert(batch(1L) == ChgRow(1L, 2L, "U", "a2"))
    assert(batch(2L) == ChgRow(2L, 1L, "D", ""), "tombstone must be emitted")
    assert(batch(4L) == ChgRow(4L, 2L, "U", "back"), "reinsert after delete")
    // stream the same changelog in three micro-batches, DESCENDING
    // version order inside key 1 — out-of-order deliveries must never
    // regress the winner
    val mem = MemoryStream[(Long, Long, String, String)]
    val q = StreamingDemo.applyChangelogStream(
        mem.toDF().toDF("key", "version", "op", "payload"))
      .writeStream.outputMode("append").format("memory")
      .queryName("chg_stream_test").start()
    try {
      mem.addData((1L, 2L, "U", "a2"), (2L, 0L, "U", "b0"))
      q.processAllAvailable()
      mem.addData((1L, 1L, "U", "a1"), (1L, 0L, "U", "a0"), (2L, 1L, "D", ""))
      q.processAllAvailable()
      mem.addData((3L, 0L, "U", "c0"), (4L, 1L, "D", ""), (4L, 2L, "U", "back"))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("chg_stream_test")
      .as[(Long, Long, String, String)].collect()
    // late lower versions for key 1 must emit NOTHING after a2 won
    assert(emitted.count(_._1 == 1L) == 1)
    // final (= max-version) emission per key equals the batch winner
    val last = emitted.groupBy(_._1).map { case (k, rows) =>
      k -> rows.maxBy(r => (r._2, r._3, r._4))
    }
    assert(last.keySet == batch.keySet)
    last.foreach { case (k, (kk, v, op, pay)) =>
      assert(ChgRow(kk, v, op, pay) == batch(k), s"key $k diverged")
    }
  }

  test("applyChangelogStream is idempotent under at-least-once redelivery") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, String)]
    val q = StreamingDemo.applyChangelogStream(
        mem.toDF().toDF("key", "version", "op", "payload"))
      .writeStream.outputMode("append").format("memory")
      .queryName("chg_redelivery_test").start()
    try {
      mem.addData((1L, 1L, "U", "x"), (2L, 1L, "U", "y"))
      q.processAllAvailable()
      val before = spark.table("chg_redelivery_test").count()
      // replay the whole changelog — the winners compare equal, so the
      // fold must emit zero new rows
      mem.addData((1L, 1L, "U", "x"), (2L, 1L, "U", "y"))
      q.processAllAvailable()
      assert(spark.table("chg_redelivery_test").count() == before,
        "redelivered winners must not re-emit")
      // a genuinely newer change still flows
      mem.addData((1L, 2L, "U", "x2"))
      q.processAllAvailable()
      assert(spark.table("chg_redelivery_test").count() == before + 1)
    } finally q.stop()
  }

  test("applyChangelogStream's ChangeState round-trips the RocksDB provider") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, String)]
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingDemo.applyChangelogStream(
          mem.toDF().toDF("key", "version", "op", "payload"))
        .writeStream.outputMode("append").format("memory")
        .queryName("chg_rocksdb_test").start()
      try {
        mem.addData((1L, 1L, "U", "v1"))
        q.processAllAvailable()
        // batch 2 reads batch 1's winner back through RocksDB: the
        // stale version must be suppressed, the newer one emitted
        mem.addData((1L, 0L, "U", "stale"), (1L, 2L, "U", "v2"))
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.table("chg_rocksdb_test")
        .as[(Long, Long, String, String)].collect().sortBy(_._2)
      assert(out.toSeq == Seq((1L, 1L, "U", "v1"), (1L, 2L, "U", "v2")),
        s"state must cross the RocksDB round-trip: ${out.mkString(",")}")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("maintainAggStream: stream == batch maintained aggregate across splits and orders") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingDemo.AggRow
    val chg = Seq(
      (1L, 0L, "I", 10L), (1L, 1L, "I", 20L), (1L, 2L, "D", 10L),
      (2L, 0L, "I", 5L), (2L, 1L, "D", 5L),              // group empties
      (3L, 1L, "I", 7L), (3L, 0L, "I", 9L),              // out of order
      (4L, 0L, "I", 3L), (4L, 0L, "I", 99L))             // same-version dup: first (op, value) wins
    val batch = StreamingDemo.maintainAggStream(
        chg.toDF("key", "version", "op", "value"))
      .collect().map(r => r.key -> r).toMap
    assert(batch(1L) == AggRow(1L, 2L, 1L, 20L))
    assert(batch(2L) == AggRow(2L, 1L, 0L, 0L), "emptied group still emits n_rows = 0")
    assert(batch(3L) == AggRow(3L, 1L, 2L, 16L))
    assert(batch(4L) == AggRow(4L, 0L, 1L, 3L), "same-version duplicate applies once")
    // stream the same changelog in three micro-batches, shuffled order
    val mem = MemoryStream[(Long, Long, String, Long)]
    val q = StreamingDemo.maintainAggStream(
        mem.toDF().toDF("key", "version", "op", "value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("agg_stream_test").start()
    try {
      mem.addData((1L, 1L, "I", 20L), (2L, 0L, "I", 5L), (4L, 0L, "I", 3L))
      q.processAllAvailable()
      mem.addData((1L, 0L, "I", 10L), (2L, 1L, "D", 5L), (3L, 1L, "I", 7L),
        (4L, 0L, "I", 99L))
      q.processAllAvailable()
      mem.addData((1L, 2L, "D", 10L), (3L, 0L, "I", 9L))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("agg_stream_test").as[AggRow].collect()
    // key 1's v0 arrived a trigger late (stale by contract) — so the
    // stream's final n differs from batch ONLY through that skip
    val last = emitted.groupBy(_.key).map { case (k, rows) =>
      k -> rows.maxBy(_.last_version)
    }
    assert(last(1L) == AggRow(1L, 2L, 0L, 10L),
      "late lower version must be skipped, later versions applied")
    assert(last(2L) == batch(2L))
    assert(last(3L) == AggRow(3L, 1L, 1L, 7L),
      "v0 after v1 is stale by the version-ordered-log contract")
    assert(last(4L) == batch(4L), "cross-trigger same-version redelivery skipped")
    // key 4's second trigger must emit NOTHING (state unchanged)
    assert(emitted.count(_.key == 4L) == 1)
  }

  test("maintainAggStream is idempotent under at-least-once redelivery") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val q = StreamingDemo.maintainAggStream(
        mem.toDF().toDF("key", "version", "op", "value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("agg_redelivery_test").start()
    try {
      mem.addData((1L, 0L, "I", 10L), (1L, 1L, "I", 5L), (2L, 0L, "I", 7L))
      q.processAllAvailable()
      val before = spark.table("agg_redelivery_test").count()
      // replay the whole changelog — every version compares ≤ the last
      // applied one, so nothing re-applies and nothing re-emits
      mem.addData((1L, 0L, "I", 10L), (1L, 1L, "I", 5L), (2L, 0L, "I", 7L))
      q.processAllAvailable()
      assert(spark.table("agg_redelivery_test").count() == before,
        "replayed deltas must not double-apply or re-emit")
    } finally q.stop()
    import StreamingDemo.AggRow
    val last = spark.table("agg_redelivery_test").as[AggRow].collect()
      .groupBy(_.key).map { case (k, rows) => k -> rows.maxBy(_.last_version) }
    assert(last(1L) == AggRow(1L, 1L, 2L, 15L))
    assert(last(2L) == AggRow(2L, 0L, 1L, 7L))
  }

  test("maintainAggStream's AggMaintState round-trips the RocksDB provider") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingDemo.maintainAggStream(
          mem.toDF().toDF("key", "version", "op", "value"))
        .writeStream.outputMode("append").format("memory")
        .queryName("agg_rocksdb_test").start()
      try {
        mem.addData((1L, 0L, "I", 10L))
        q.processAllAvailable()
        // batch 2 reads batch 1's (lastVersion, n, total) back through
        // RocksDB: the replayed v0 must be skipped, v1 applied on top
        mem.addData((1L, 0L, "I", 10L), (1L, 1L, "I", 5L))
        q.processAllAvailable()
      } finally q.stop()
      import StreamingDemo.AggRow
      val out = spark.table("agg_rocksdb_test").as[AggRow].collect()
        .sortBy(_.last_version)
      assert(out.toSeq == Seq(AggRow(1L, 0L, 1L, 10L), AggRow(1L, 1L, 2L, 15L)),
        s"state must cross the RocksDB round-trip: ${out.mkString(",")}")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private val FUNNEL_STEPS = Seq("view", "click", "buy")

  test("funnelStream batch arm equals the batch Funnel operator; stream emits each advance") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingDemo.FunnelRow
    val rows = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
      (2L, 10L, "view"), (2L, 500L, "click"),   // outside the window
      (3L, 10L, "click"),                        // never anchors
      (4L, 10L, "view"), (4L, 10L, "click"))     // same-ts: not strictly after
    val df = rows.toDF("user_id", "ts_us", "event_type")
    val batchTwin = StreamingDemo.funnelStream(df, "user_id", "ts_us",
        "event_type", FUNNEL_STEPS, 100L)
      .collect().map(r => r.user_id -> r).toMap
    val batchOp = graft.operators.Funnel.funnel(df, "user_id", "ts_us",
        "event_type", FUNNEL_STEPS, 100L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> FunnelRow(r._1, r._2, r._3, r._4)).toMap
    assert(batchTwin == batchOp, "twin fold must equal the batch operator")
    // in-order stream across three triggers: final rows equal batch,
    // and each depth advance emits progressively
    val mem = MemoryStream[(Long, Long, String)]
    val q = StreamingDemo.funnelStream(
        mem.toDF().toDF("user_id", "ts_us", "event_type"),
        "user_id", "ts_us", "event_type", FUNNEL_STEPS, 100L)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_stream_test").start()
    try {
      mem.addData((1L, 10L, "view"), (2L, 10L, "view"), (3L, 10L, "click"))
      q.processAllAvailable()
      mem.addData((1L, 20L, "click"), (4L, 10L, "view"), (4L, 10L, "click"))
      q.processAllAvailable()
      mem.addData((1L, 30L, "buy"), (2L, 500L, "click"))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("funnel_stream_test").as[FunnelRow].collect()
    assert(emitted.count(_.user_id == 1L) == 3, "one row per depth advance")
    val finals = emitted.groupBy(_.user_id)
      .map { case (u, rs) => u -> rs.maxBy(_.steps_completed) }
    assert(finals == batchOp, "in-order stream must converge to the batch result")
  }

  test("funnelStream skips stale events and replays (at-least-once safety)") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingDemo.FunnelRow
    val mem = MemoryStream[(Long, Long, String)]
    val q = StreamingDemo.funnelStream(
        mem.toDF().toDF("user_id", "ts_us", "event_type"),
        "user_id", "ts_us", "event_type", FUNNEL_STEPS, 100L)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_stale_test").start()
    try {
      mem.addData((1L, 50L, "view"))
      q.processAllAvailable()
      // a click BEFORE the seen frontier is stale by contract: no
      // retroactive anchoring or advancing
      mem.addData((1L, 20L, "click"))
      q.processAllAvailable()
      val afterStale = spark.table("funnel_stale_test").count()
      assert(afterStale == 1, "stale event must not advance the funnel")
      // replaying the anchor (same ts) is admissible but cannot
      // re-anchor or re-emit (depth already 1, view is not step 2)
      mem.addData((1L, 50L, "view"))
      q.processAllAvailable()
      assert(spark.table("funnel_stale_test").count() == 1)
      // fresh in-order click still advances
      mem.addData((1L, 60L, "click"))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("funnel_stale_test").as[FunnelRow].collect()
      .maxBy(_.steps_completed)
    assert(last == FunnelRow(1L, 2L, 50L, 60L))
  }

  test("funnelStream's FunnelState round-trips the RocksDB provider") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingDemo.FunnelRow
    val mem = MemoryStream[(Long, Long, String)]
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingDemo.funnelStream(
          mem.toDF().toDF("user_id", "ts_us", "event_type"),
          "user_id", "ts_us", "event_type", FUNNEL_STEPS, 100L)
        .writeStream.outputMode("append").format("memory")
        .queryName("funnel_rocksdb_test").start()
      try {
        mem.addData((1L, 10L, "view"))
        q.processAllAvailable()
        mem.addData((1L, 20L, "click"), (1L, 30L, "buy"))
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.table("funnel_rocksdb_test").as[FunnelRow].collect()
        .sortBy(_.steps_completed)
      assert(out.toSeq == Seq(FunnelRow(1L, 1L, 10L, 10L),
        FunnelRow(1L, 2L, 10L, 20L), FunnelRow(1L, 3L, 10L, 30L)),
        s"state must cross the RocksDB round-trip: ${out.mkString(",")}")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("anomalyStream: stream == batch operator rows under in-order delivery") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingDemo.AnomalyRow
    val rows = (0 until 40).map(i =>
      ("m", i.toLong, 100L + i, ((i * 37) % 19).toDouble))
    val df = rows.toDF("k", "ts", "id", "x")
    val batchOp = graft.operators.Anomaly.rollingZScores(df,
        "k", "ts", "id", "x", windowN = 4)
      .select(col("id").as("event_id"), col("k").as("event_type"),
        col("ts").as("ts_us"), col("x").as("value"),
        col("zq"), col("is_anomaly"))
      .as[AnomalyRow].collect().sortBy(_.event_id)
    val twin = StreamingDemo.anomalyStream(df, "k", "ts", "id", "x",
        windowN = 4).collect().sortBy(_.event_id)
    assert(twin.toSeq == batchOp.toSeq, "batch arm must equal the batch operator")
    val mem = MemoryStream[(String, Long, Long, Double)]
    val q = StreamingDemo.anomalyStream(
        mem.toDF().toDF("k", "ts", "id", "x"), "k", "ts", "id", "x", windowN = 4)
      .writeStream.outputMode("append").format("memory")
      .queryName("anomaly_stream_test").start()
    try {
      rows.grouped(13).foreach { batch =>
        mem.addData(batch: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val emitted = spark.table("anomaly_stream_test").as[AnomalyRow]
      .collect().sortBy(_.event_id)
    assert(emitted.toSeq == batchOp.toSeq,
      "in-order stream must emit exactly the batch rows")
  }

  test("anomalyStream drops null values like the batch operator") {
    import StreamingDemo.AnomalyRow
    // null at ts 2 must neither score nor occupy a window slot: the
    // 3-window completes at the THIRD non-null value (ts 4)
    val df = Seq[(String, Long, Long, java.lang.Double)](
        ("m", 1L, 1L, 1.0), ("m", 2L, 2L, null),
        ("m", 3L, 3L, 1.0), ("m", 4L, 4L, 7.0))
      .toDF("k", "ts", "id", "x")
    val twin = StreamingDemo.anomalyStream(df, "k", "ts", "id", "x",
      windowN = 3).collect().sortBy(_.event_id)
    val op = graft.operators.Anomaly.rollingZScores(df,
        "k", "ts", "id", "x", windowN = 3)
      .select(col("id").as("event_id"), col("k").as("event_type"),
        col("ts").as("ts_us"), col("x").as("value"),
        col("zq"), col("is_anomaly"))
      .as[AnomalyRow].collect().sortBy(_.event_id)
    assert(twin.toSeq == op.toSeq, "twin must drop nulls like the batch operator")
    assert(twin.map(_.event_id).toSeq == Seq(4L),
      "only the third non-null row completes the window")
  }

  test("anomalyStream skips replays and stale events (window never double-inserts)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long, Double)]
    val q = StreamingDemo.anomalyStream(
        mem.toDF().toDF("k", "ts", "id", "x"), "k", "ts", "id", "x", windowN = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("anomaly_replay_test").start()
    try {
      mem.addData(("m", 1L, 1L, 1.0), ("m", 2L, 2L, 5.0))
      q.processAllAvailable()
      val before = spark.table("anomaly_replay_test").count()
      // full replay + one genuinely stale event: nothing re-emits
      mem.addData(("m", 1L, 1L, 1.0), ("m", 2L, 2L, 5.0), ("m", 0L, 9L, 99.0))
      q.processAllAvailable()
      assert(spark.table("anomaly_replay_test").count() == before,
        "replays and stale events must not re-enter the window")
      mem.addData(("m", 3L, 3L, 1.0))
      q.processAllAvailable()
      assert(spark.table("anomaly_replay_test").count() == before + 1)
    } finally q.stop()
  }

  test("anomalyStream's AnomalyState round-trips the RocksDB provider") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingDemo.AnomalyRow
    val mem = MemoryStream[(String, Long, Long, Double)]
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingDemo.anomalyStream(
          mem.toDF().toDF("k", "ts", "id", "x"), "k", "ts", "id", "x", windowN = 3)
        .writeStream.outputMode("append").format("memory")
        .queryName("anomaly_rocksdb_test").start()
      try {
        mem.addData(("m", 1L, 1L, 1.0), ("m", 2L, 2L, 1.0))
        q.processAllAvailable()
        // batch 2's window must contain batch 1's two values read back
        // through RocksDB: quantized 1024,1024,7168 -> mean 3072,
        // varNum/n = 8·1024² -> z = 4096/sqrt(8·1024²) = sqrt(2)
        mem.addData(("m", 3L, 3L, 7.0))
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.table("anomaly_rocksdb_test").as[AnomalyRow].collect()
      assert(out.length == 1 && out.head.event_id == 3L)
      val expectedZ = 4096.0 / math.sqrt(8.0 * 1024.0 * 1024.0)
      assert(math.abs(out.head.zq - expectedZ) < 1e-12,
        s"window must cross the RocksDB round-trip: ${out.head}")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
