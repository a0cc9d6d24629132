package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JacobiEig

/** The replayable eigensolvers behind the PCA/MDS oracles: fixed-sweep
  * Jacobi and fixed-iteration power iteration must be numerically
  * correct (they replace LAPACK) and strictly deterministic (the
  * DuckDB replay depends on it).
  */
class JacobiEigSpec extends AnyFunSuite {

  private def matmulVec(a: Array[Array[Double]], v: Array[Double]): Array[Double] =
    Array.tabulate(a.length)(i => a(i).zip(v).map { case (x, y) => x * y }.sum)

  private val sym = Array(
    Array(4.0, 1.0, 0.5, 0.0),
    Array(1.0, 3.0, 0.2, 0.1),
    Array(0.5, 0.2, 2.0, 0.3),
    Array(0.0, 0.1, 0.3, 1.0))

  test("eigSym: eigenpairs satisfy A·v = λ·v to machine precision") {
    val (evals, v) = JacobiEig.eigSym(sym)
    for (j <- 0 until 4) {
      val vec = Array.tabulate(4)(i => v(i)(j))
      val av = matmulVec(sym, vec)
      for (i <- 0 until 4)
        assert(math.abs(av(i) - evals(j) * vec(i)) < 1e-12,
          s"residual at ($i,$j): ${av(i)} vs ${evals(j) * vec(i)}")
    }
  }

  test("eigSym: eigenvectors are orthonormal, eigenvalue sum = trace") {
    val (evals, v) = JacobiEig.eigSym(sym)
    for (j <- 0 until 4; k <- j until 4) {
      val dot = (0 until 4).map(i => v(i)(j) * v(i)(k)).sum
      val expect = if (j == k) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-12, s"v${j}.v$k = $dot")
    }
    assert(math.abs(evals.sum - (4.0 + 3.0 + 2.0 + 1.0)) < 1e-12)
  }

  test("eigSym: input matrix is not mutated") {
    val pristine = sym.map(_.clone())
    JacobiEig.eigSym(sym)
    assert(sym.map(_.toSeq).toSeq == pristine.map(_.toSeq).toSeq)
  }

  test("eigSym: diagonal matrix is a fixed point") {
    val d = Array(Array(5.0, 0.0), Array(0.0, -2.0))
    val (evals, v) = JacobiEig.eigSym(d)
    assert(evals.toSeq == Seq(5.0, -2.0))
    assert(v(0)(0) == 1.0 && v(1)(1) == 1.0 && v(0)(1) == 0.0 && v(1)(0) == 0.0)
  }

  test("powerTop: dominant eigenpair matches Jacobi; deflation finds the runner-up") {
    val (jEvals, jV) = JacobiEig.eigSym(sym)
    val order = jEvals.zipWithIndex.sortBy(-_._1)
    val (l1, v1) = JacobiEig.powerTop(sym)
    assert(math.abs(l1 - order(0)._1) < 1e-9, s"top eigenvalue $l1 vs ${order(0)._1}")
    val top = Array.tabulate(4)(i => jV(i)(order(0)._2))
    // compare up to sign
    val align = math.signum(top.zip(v1).map { case (a, b) => a * b }.sum)
    top.zip(v1).foreach { case (a, b) => assert(math.abs(a - align * b) < 1e-9) }

    val b2 = Array.tabulate(4, 4)((i, j) => sym(i)(j) - l1 * v1(i) * v1(j))
    val (l2, _) = JacobiEig.powerTop(b2)
    assert(math.abs(l2 - order(1)._1) < 1e-9, s"second eigenvalue $l2 vs ${order(1)._1}")
  }

  test("powerTop: zero matrix stays finite (zero-norm guard)") {
    val z = Array.fill(3, 3)(0.0)
    val (lam, v) = JacobiEig.powerTop(z)
    assert(lam == 0.0)
    assert(v.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("startComponent: bounded, deterministic, not constant") {
    val xs = (1L to 100L).map(JacobiEig.startComponent)
    assert(xs.forall(x => x >= -0.5 && x < 0.5))
    assert(xs.distinct.size > 90) // hash spreads
  }
}
