package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the Bench→driver output contract.
  *
  * The driver tail-captures ~2 KB of Bench's COMBINED stdout+stderr and
  * JSON-parses the last line. Rounds 6 and 7 both shipped `"parsed":
  * null` artifacts because output printed after the contract line
  * pushed it out of that window. Two invariants keep that from
  * recurring as the headline list grows:
  *   1. the contract line itself must fit the window with margin
  *      (< 1.8 KB even with worst-case 4-digit-second values), and
  *   2. every headline name must resolve to a registered query (a typo
  *      would silently shrink the bench, not fail it).
  */
class BenchContractSpec extends AnyFunSuite {

  test("contract line stays under the driver's ~2KB tail-capture window") {
    // Worst case: every query slow (4 integer digits), hot-start n=4,
    // and full-width loadavg fields.
    val worst = Bench.headline.map(n =>
      n -> Vector(9999.999, 9999.999, 9999.999, 9999.999))
    // worst suspect payload: EVERY query suspect — the adaptive cap
    // must fold names into the "+K" overflow until the line fits
    val allSuspect = Bench.headline.sortBy(-_.length)
    val line = Bench.contractLine(worst, "/root/testdata/sf0.1",
      "99.99 99.99 99.99", "99.99 99.99 99.99", hotStart = true,
      busyFrac = -1.0, suspect = allSuspect)
    // 1850, not 1800: the driver tail-captures ~2048 bytes and the
    // rounds-6/7 evictions were output AFTER the line, not length —
    // 1850 leaves ~200 bytes of newline/launcher margin while making
    // room for the always-present (possibly overflow-only) suspect field
    assert(line.length < 1850,
      s"contract line is ${line.length} bytes; driver tail-captures ~2KB — " +
        "trim query names or split the headline list")
    assert(!line.contains("\n"))
    assert(line.contains("\"suspect\":["), "suspect field must survive trimming")
    assert(line.matches(""".*"\+\d+"\].*"""),
      "overflow marker must record the trimmed suspect count")
    // the realistic shape — sub-10s queries, a couple of suspects —
    // ships full names
    val realistic = Bench.headline.map(n => n -> Vector(1.234, 1.234))
    val line2 = Bench.contractLine(realistic, "/root/testdata/sf0.1",
      suspect = Seq("q_sim_ivfpq_topk", "q_lm_buckets"))
    assert(line2.contains("\"suspect\":[\"q_sim_ivfpq_topk\",\"q_lm_buckets\"]"))
    assert(line2.length < 1850)
  }

  test("suspect adjudication: trigger math, n=5 cap list, medians parsing") {
    val prior = Map("q_slow" -> 3.0, "q_fast" -> 0.1)
    // 3x + 0.5s absolute: 9.2 > 9.0 and > 3.5 — suspect
    assert(Bench.isSuspect("q_slow", Vector(9.2, 10.0), prior))
    // 3x not met
    assert(!Bench.isSuspect("q_slow", Vector(8.9), prior))
    // sub-second noise: 0.4 > 3x0.1 but not > med+0.5 — NOT suspect
    assert(!Bench.isSuspect("q_fast", Vector(0.4), prior))
    assert(Bench.isSuspect("q_fast", Vector(0.7), prior))
    // unknown query / failed run never trigger
    assert(!Bench.isSuspect("q_new", Vector(99.0), prior))
    assert(!Bench.isSuspect("q_slow", Vector(-1.0), prior))
    assert(Bench.suspectOf(
      Seq("q_slow" -> Vector(9.2), "q_fast" -> Vector(0.2)), prior) == Seq("q_slow"))
    // the real prior artifact parses and covers the headline
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("MEDIANS_r13.json")), "UTF-8")
    val parsed = Bench.parseMedians(raw)
    assert(parsed.nonEmpty && parsed.contains("q_sim_ivfpq_topk"))
    assert(math.abs(parsed("q_sim_ivfpq_topk") - 0.663) < 1e-9)
    // sf guard: a medians artifact from a different scale factor is
    // ignored (3x of an sf0.1 median means nothing at sf0.001)
    assert(Bench.parseMedians(raw, "/root/testdata/sf0.1").nonEmpty)
    assert(Bench.parseMedians(raw, "/root/testdata/sf0.001").isEmpty)
    // malformed input degrades to empty, never throws
    assert(Bench.parseMedians("not json").isEmpty)
    assert(Bench.parseMedians("{}").isEmpty)
  }

  test("every headline query is registered in SparkEntry.queries") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names not in SparkEntry.queries: $missing")
  }

  test("headline has no duplicates") {
    val dups = Bench.headline.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dups.isEmpty, s"duplicate headline entries: $dups")
  }
}
