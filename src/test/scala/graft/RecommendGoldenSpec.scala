package graft

/** Value-level pin for q_recommend_charts — the full search pipeline
  * has no tractable SQL oracle, so its gate check replays the pinned
  * output as a VALUES literal ([[RecommendGolden.valuesOracle]]).
  * This spec asserts the pipeline still produces EXACTLY the pinned
  * rows (all four columns) on the gate fixture (customer at sf0.01,
  * default config). Everything feeding these numbers is deterministic
  * by construction (canonical-order fits, seeded draws,
  * partition-independent rank/nominalize), so an exact match is the
  * correct expectation — a drift here means the search pipeline's
  * semantics changed, and the pin should only be regenerated for a
  * deliberate change (dump /tmp/out/q_recommend_charts from Verify,
  * then update [[RecommendGolden.rows]] — spec AND oracle share it).
  *
  * Pin history: regenerated round 7 for one deliberate scale-behavior
  * change — searchEmbedSampleFit is now ON by default (types.scala),
  * so at the 1500-row gate fixture the mds/tsne/umap channels run the
  * digest-sampled bounded fit + out-of-sample transform
  * (CoreT.embedSampled) instead of being skipped (tsne/umap) or
  * exact-fitted (mds). Rounds ≤6 pins are reproducible with
  * searchEmbedSampleFit=false.
  */
class RecommendGoldenSpec extends SparkSpec {

  test("golden: q_recommend_charts gate fixture — exact 4-column row set") {
    val df = AssemblyQueries.queries("q_recommend_charts")(spark, "/root/testdata/sf0.01")
    val got = df.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getString(2), r.getString(3))).toSet
    val expected = RecommendGolden.rows.toSet
    val gotSigs = got.map(_._3)
    val expSigs = expected.map(_._3)
    assert(gotSigs == expSigs,
      s"signature drift:\n+${(gotSigs -- expSigs).mkString("\n+")}" +
        s"\n-${(expSigs -- gotSigs).mkString("\n-")}")
    assert(got == expected, {
      val drift = (got -- expected) ++ (expected -- got)
      s"row drift (score/chart_type/channels):\n${drift.mkString("\n")}"
    })
  }

  test("oracle literal is bit-exact: every score round-trips through its SQL integer ratio") {
    // mirror of doubleLit's guarantee, evaluated in the JVM: n/2^k
    // must divide back to the pinned double exactly (IEEE division of
    // exactly-representable operands is correctly rounded)
    val lit = raw"\(CAST\((-?\d+) AS DOUBLE\) / (\d+)\)|CAST\((-?\d+) AS DOUBLE\)".r
    val sql = RecommendGolden.valuesOracle
    val scoreLits = lit.findAllMatchIn(sql).toSeq
    assert(scoreLits.size == RecommendGolden.rows.size)
    scoreLits.zip(RecommendGolden.rows.sortBy(x => sql.indexOf(x._3))).foreach {
      case (m, _) => // structural parse only; value check below
        assert(m.matched.nonEmpty)
    }
    RecommendGolden.rows.foreach { case (_, score, sig, _) =>
      // reconstruct from the emitted SQL fragment for this row
      val row = sql.linesIterator.find(_.contains(s"'${sig.replace("'", "''")}'")).get
      lit.findFirstMatchIn(row) match {
        case Some(m) if m.group(1) != null =>
          val v = m.group(1).toDouble / m.group(2).toLong
          assert(v == score, s"$sig: $v != $score")
        case Some(m) =>
          assert(m.group(3).toDouble == score, s"$sig literal mismatch")
        case None => fail(s"no score literal found for $sig")
      }
    }
  }
}
