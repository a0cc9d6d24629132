package graft

import graft.plans.{Enumerator, Load}
import graft.profiler.Profiler
import graft.score.{Scagnostics, Significance}

/** Golden end-to-end pins (SURVEY §5.2): exact values for a fixed
  * fixture, locking profiling, enumeration, and deterministic scoring
  * semantics against refactors. Regenerate with
  * `runMain graft.tools.GoldenGen` when a SEMANTIC change is intended.
  */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = (1 to 50).map { i =>
    (s"id$i", if (i % 5 == 0) "gold" else "base",
      i * 1.0, i * 1.0 + 10, 2.0 * i, 100.0 - i)
  }.toDF("name", "tier", "m one", "m two", "m three", "other")

  test("golden: profile facts") {
    val (_, p) = Profiler.profile(fixture)
    assert(p.keyColumn.contains("name"))
    assert(p.column("name").get.logicalType == LogicalType.Str)
    assert(p.column("tier").get.logicalType == LogicalType.Nominal)
    assert(p.column("tier").get.distinctCount == 2)
    Seq("m one", "m two", "m three", "other").foreach { c =>
      assert(p.column(c).get.logicalType == LogicalType.Real, c)
    }
    assert(p.column("m one").get.min.contains(1.0))
    assert(p.column("m one").get.max.contains(50.0))
    assert(p.dimClusters == Seq(Seq("m one", "m two", "m three", "other")))
    // shifted-identical distributions: W1 == the shift exactly
    assert(p.distanceMatrix(("m one", "m two")) == 10.0)
  }

  test("golden: enumeration pool shape and loads") {
    val (_, p) = Profiler.profile(fixture)
    val pool = Enumerator.dedupe(Enumerator.enumerate(p, "pca"))
    assert(pool.size == 3)
    val fps = pool.map(_.fingerprint).toSet
    assert(fps.contains("select#==#m one,m two,m three,other#new_table#"))
    assert(fps.contains(
      "rank#like#real#append# - select#==#rank m one,rank m two,rank m three,rank other#new_table#"))
    val arith = pool.find(_.steps.exists(_.op == "sum")).get
    // Load = (cal_load[sum]·(|cluster|−1), mean pairwise W1, mean name dist)
    assert(arith.load == Load(30.0, 27.416666666666668, 0.8333333333333334))
    assert(Enumerator.enumerate(p, "null_num1").size == 9) // 4 + 4 rank + 1 sum
  }

  test("golden: scagnostics on a fixed Lissajous point set") {
    val pts = (0 until 40).map(i => (math.sin(i * 0.7) * 10, math.cos(i * 0.3) * 10)).toArray
    val g = new Scagnostics.Graph(pts)
    def ≈(a: Double, b: Double) = assert(math.abs(a - b) < 1e-9, s"$a vs $b")
    ≈(g.outlying, 100.0)
    ≈(g.skewed, 48.4908785724)
    ≈(g.stringy, 71.4036317786)
    ≈(g.straight, 8.3929806631)
    ≈(g.striated, 65.6023858508)
    ≈(g.monotonic, 13.3020637899)
    ≈(g.clumpy, 2.5955464199) // normalization floor = 0, the reference's dense-matrix np.min
  }

  test("golden: significance formulas (reference quirks intact)") {
    val vals = Array(5.0, 7.0, 6.5, 8.0, 30.0, 6.0)
    assert(math.abs(Significance.outstanding1(vals) - 98.7912222818) < 1e-9)
    assert(math.abs(Significance.linearness(vals.sorted) - 94.7971970454) < 1e-9)
  }

  test("golden: lda labels pinned (deterministic VB fit, partition-independent)") {
    // VBLda is a pure function of the canonically-ordered count matrix
    // (MirrorMath transcendentals, counter-hash init), so the exact
    // labels must reproduce run over run, JVM over JVM, and across ANY
    // partitioning. If this breaks, determinism of the lda operator has
    // regressed — re-pin only for a deliberate algorithm change.
    import spark.implicits._
    def frame(parts: Int) = (0 until 40).map { i =>
      (i.toLong, (i % 7).toDouble, ((i * 3) % 11).toDouble, (i / 4).toDouble)
    }.toDF("k", "x", "y", "z").repartition(parts)
    def fit(parts: Int): Array[(Long, String)] =
      graft.operators.CoreT.lda(frame(parts), Seq("x", "y", "z"), Seq("k"), k = 3).get
        .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    val a = fit(2)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(a.mkString("|").getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5 == "620fba6dc99302465d4cde6c2e1d9587", s"lda pin drifted: $md5")
    assert(a.map(_._2).distinct.sorted.toList == List(
      "0.7212*x + 0.1782*z + 0.1004*y",
      "0.7251*z + 0.1529*y + 0.1219*x",
      "0.7857*y + 0.1198*z + 0.0943*x"))
    assert(fit(7).toSeq == a.toSeq) // partitioning-INDEPENDENT, not just seeded
  }
}
