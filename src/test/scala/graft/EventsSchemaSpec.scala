package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import graft.sources.Tables

/** Schema-adaptive events reader (sources/Tables.scala).
  *
  * The harness has regenerated events.parquet with different timestamp
  * physical types across rounds (TIMESTAMP(NANOS) through round 5,
  * naive timestamp[us] from round 6's regeneration), so eventsRawNanos
  * keys off the loaded dtype. These tests pin each branch to the exact
  * epoch-nanos DuckDB's `epoch_ns(ts)` produces — the oracle contract —
  * including under a non-UTC session timezone (the ADVICE r6 hazard:
  * NTZ→instant casts are session-tz-dependent; our branches must not be).
  */
class EventsSchemaSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private def dataPresent = new java.io.File(s"$sfDir/events.parquet").exists()

  // DuckDB: SELECT event_id, epoch_ns(ts) FROM events ORDER BY event_id LIMIT 3
  private val duckdbPinned = Seq(
    0L -> 1704067798778549000L,
    1L -> 1704068166738090000L,
    2L -> 1704068217102229000L)

  test("eventsRawNanos matches DuckDB epoch_ns on the live data") {
    assume(dataPresent)
    val got = Tables.eventsRawNanos(spark, sfDir)
      .select("event_id", "ts").orderBy("event_id").limit(3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got === duckdbPinned)
    assert(Tables.eventsRawNanos(spark, sfDir).schema("ts").dataType === LongType)
  }

  test("eventsRawNanos is session-timezone-independent") {
    assume(dataPresent)
    val shifted = spark.newSession()
    shifted.conf.set("spark.sql.session.timeZone", "America/New_York")
    val got = Tables.eventsRawNanos(shifted, sfDir)
      .select("event_id", "ts").orderBy("event_id").limit(3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got === duckdbPinned)
  }

  test("events returns a micros TimestampType carrying the same instant") {
    assume(dataPresent)
    val e = Tables.events(spark, sfDir)
    assert(e.schema("ts").dataType === TimestampType)
    val got = e.select(col("event_id"), unix_micros(col("ts")))
      .orderBy("event_id").limit(3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got === duckdbPinned.map { case (id, ns) => id -> ns / 1000 })
  }

  test("LongType branch: legacy nanos-as-long data passes through untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_long").toString
    spark.range(3).select(col("id").as("event_id"),
        (col("id") * 1000000000L + 1704067200000000000L).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.eventsRawNanos(spark, dir)
      .orderBy("event_id").collect().map(_.getLong(1)).toSeq
    assert(got === Seq(1704067200000000000L, 1704067201000000000L, 1704067202000000000L))
  }
}
