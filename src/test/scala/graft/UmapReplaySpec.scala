package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UMAP

/** Guards the UMAP↔[[UmapOracle]] replay contract — the pieces whose
  * silent drift would desynchronize the SQL replay without failing any
  * quality spec. Cross-engine equality itself is proven by the
  * q_coret_umap value gate (and tools/umap_oracle_dev.py stage checks). */
class UmapReplaySpec extends AnyFunSuite {

  test("draw: pinned values (the oracle mirrors these in BIGINT)") {
    // counter-based quadratic-congruential hash, seed 9, bound 100 —
    // the gate query's exact configuration. First ten draws, 0-based:
    val got = (0L until 10L).map(UMAP.draw(_, 9L, 100))
    assert(got == Seq(75, 70, 37, 82, 5, 0, 73, 71, 94, 42), got)
    // full-period sanity: one pass over 2^15 counters is roughly
    // uniform (no bound-sized bucket starves or doubles)
    val counts = (0L until 32768L).map(UMAP.draw(_, 9L, 100))
      .groupBy(identity).view.mapValues(_.size)
    assert(counts.values.min > 200 && counts.values.max < 460, counts.values.toSeq.sorted)
  }

  test("draw: every intermediate stays below 2^62 (BIGINT-exact on both engines)") {
    // worst case by construction: x1·x1 < p² = (2^31-1)² < 2^62
    val p = 2147483647L
    assert((p - 1) * (p - 1) > 0L && (p - 1) * (p - 1) < (1L << 62))
  }

  test("firing schedule: closed form fires at most once per epoch, at rate ~1/eps") {
    def fires(epochs: Int, eps: Double): Seq[Int] =
      (1 to epochs).filter { t =>
        math.min(t.toDouble, math.floor(t / eps)) >
          math.min(t - 1.0, math.floor((t - 1) / eps))
      }
    assert(fires(10, 1.0) == (1 to 10))            // max-weight edge: every epoch
    assert(fires(10, 2.5) == Seq(3, 5, 8, 10))     // floor(t/2.5) increments
    assert(fires(10, 100.0) == Seq())              // cold edge: never within horizon
    // rate check across irrational eps values
    for (eps <- Seq(1.3, 1.9999999, 3.7, 7.77)) {
      val n = fires(10000, eps).size
      assert(math.abs(n - 10000 / eps) <= 1.0, s"eps=$eps n=$n")
    }
  }

  test("oracle SQL hygiene: real constants are e-notation (DuckDB DECIMAL-literal trap)") {
    // DuckDB parses plain decimal literals as DECIMAL; literal-only
    // subexpressions then constant-fold in exact decimal arithmetic
    // and round differently than doubles (cost one full SGD divergence
    // to find). The kernel/ln constants must stay e-notation.
    val sql = UmapOracle.sql
    assert(!sql.contains("0.8950608779109733)"), "UB leaked as a plain decimal literal")
    assert(!sql.contains("1.5769434603113077)"), "UA leaked as a plain decimal literal")
    assert(!sql.contains("0.6931471805599453"), "ln2 leaked as a plain decimal literal")
    assert(sql.contains("8.950608779109733e-1") && sql.contains("6.931471805599453e-1"))
    // and the gate epoch pin is what the gate query actually uses
    // (30 since round 8 — the 150-epoch replay cost 321s of DuckDB
    // time and blew the driver's correctness window two rounds
    // running; the whole oracle gate must stay under ~3 min)
    assert(UmapOracle.GateEpochs == 30)
  }

  test("clamped kernel: embeddings with exact duplicate points stay finite") {
    // duplicate inputs collapse to identical normalized points; the
    // 1e-30 distance floor must keep every coordinate finite
    val pts = Array.fill(20)(Array(0.3, 0.7)) ++
      Array.tabulate(20)(i => Array(i / 20.0, 1.0 - i / 20.0))
    val y = UMAP.embed(pts, nNeighbors = 5, epochs = 30)
    assert(y.length == 40)
    assert(y.forall(p => java.lang.Double.isFinite(p(0)) && java.lang.Double.isFinite(p(1))))
  }
}
