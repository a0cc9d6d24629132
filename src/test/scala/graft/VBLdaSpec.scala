package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MirrorMath, VBLda}

/** Unit behavior of the deterministic VB-LDA fit (the q_coret_lda
  * value gate proves cross-engine equality; this pins the math). */
class VBLdaSpec extends AnyFunSuite {

  test("digammam matches known values to 2e-11") {
    // ψ(1) = −γ, ψ(1/2) = −γ − 2ln2, ψ(n) = −γ + H_{n−1}. The 5-term
    // Bernoulli series truncates at ~1e-11 absolute right at the x = 6
    // recurrence boundary (next term B₁₂/(12·6¹²)) — plenty for VB-LDA,
    // whose contract is cross-engine EQUALITY, not last-ulp accuracy.
    val euler = 0.5772156649015329
    assert(math.abs(MirrorMath.digammam(1.0) + euler) < 2e-11)
    assert(math.abs(MirrorMath.digammam(0.5) + euler + 2 * math.log(2)) < 2e-11)
    assert(math.abs(MirrorMath.digammam(5.0) + euler - (1.0 + 1.0 / 2 + 1.0 / 3 + 1.0 / 4)) < 2e-11)
    assert(math.abs(MirrorMath.digammam(100.0) - 4.600161852738087) < 2e-11)
  }

  test("fit separates two obvious topic blocks and is deterministic") {
    // docs 0..19 weighted on word 0, docs 20..39 on word 1
    val docs = Array.tabulate(40)(d =>
      if (d < 20) Array(90.0, 10.0) else Array(10.0, 90.0))
    val fit = VBLda.fit(docs, k = 2)
    val am = VBLda.argmaxTopics(fit)
    assert(am.take(20).distinct.length == 1)
    assert(am.drop(20).distinct.length == 1)
    assert(am(0) != am(39))
    // the dominant topic of each block puts most weight on its word
    val terms = VBLda.topTerms(fit, 2)
    val t0 = terms(am(0)); val t1 = terms(am(39))
    assert(t0.head._1 == 0 && t0.head._2 > 0.7, t0)
    assert(t1.head._1 == 1 && t1.head._2 > 0.7, t1)
    // bit-identical rerun
    val fit2 = VBLda.fit(docs, k = 2)
    assert(fit.lambda.flatten.toSeq == fit2.lambda.flatten.toSeq)
    assert(fit.gamma.flatten.toSeq == fit2.gamma.flatten.toSeq)
  }

  test("fit is a pure function of the doc MULTISET: permutations give identical lambda") {
    // the pinned-integer statistics (round 6) make the sstats sum
    // exact and commutative — the property the distributed E-step's
    // correctness rests on; reversal + an interleave both must match
    val docs = Array.tabulate(60)(d =>
      Array((d % 7 + 1) * 11.0, (d % 5 + 1) * 13.0, (d % 3 + 1) * 17.0))
    val base = VBLda.fit(docs, k = 4)
    val rev = VBLda.fit(docs.reverse, k = 4)
    val shuf = VBLda.fit(docs.indices.sortBy(i => (i * 37) % 60).map(docs).toArray, k = 4)
    for (f <- Seq(rev, shuf); i <- base.lambda.indices; j <- base.lambda(i).indices)
      assert(f.lambda(i)(j) == base.lambda(i)(j), s"λ($i)($j) moved under reorder")
  }

  test("docEStep posterior sums to alpha*K + doc mass (VB invariant)") {
    // Σγ = Σα + n_d holds at the mean-field fixed point up to tol
    val docs = Array(Array(30.0, 70.0))
    val fit = VBLda.fit(docs, k = 4)
    val g = fit.gamma(0)
    assert(math.abs(g.sum - (0.25 * 4 + 100.0)) < 0.1, g.toSeq)
  }

  test("argmax ties break to the first topic, like Vector.argmax") {
    val f = VBLda.Fit(Array(Array(1.0)), Array(Array(2.0, 2.0, 2.0)))
    assert(VBLda.argmaxTopics(f).head == 0)
  }
}
