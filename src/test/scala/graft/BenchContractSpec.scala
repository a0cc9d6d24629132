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
    val line = Bench.contractLine(worst, "/root/testdata/sf0.1",
      "99.99 99.99 99.99", "99.99 99.99 99.99", hotStart = true,
      busyFrac = -1.0)
    assert(line.length < 1800,
      s"contract line is ${line.length} bytes; driver tail-captures ~2KB — " +
        "trim query names or split the headline list")
    assert(!line.contains("\n"))
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
