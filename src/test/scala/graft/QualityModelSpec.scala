package graft

import graft.operators.QualityModel

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  test("gaussSolve recovers the solution of a hand-checked SPD system") {
    // A = LLᵀ for L = [[2,0],[1,3]] → A = [[4,2],[2,10]]; pick w = (3,-1)
    val a = Array(Array(4.0, 2.0), Array(2.0, 10.0))
    val b = Array(4.0 * 3 + 2.0 * -1, 2.0 * 3 + 10.0 * -1) // A·w
    val w = QualityModel.gaussSolve(a, b)
    assert(math.abs(w(0) - 3.0) < 1e-12 && math.abs(w(1) + 1.0) < 1e-12)
    // inputs must not be clobbered (the caller reuses the Gram matrix)
    assert(a(0)(0) == 4.0 && a(1)(0) == 2.0 && b(1) == -4.0)
  }

  test("distill output: one row per doc, resid = rare_frac - pred") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog slept"),
      (2L, "zzqx qwfp vbnm xkcd zyxw"), // all-rare gibberish
      (3L, "the the the the the the the the"),
      (4L, "numbers 12345 67890 11111 22222"),
      (5L, ""),
      (6L, "a balanced sentence with a few common words and some chaff")
    ).toDF("doc_id", "text")
    val out = QualityModel.distill(docs, "doc_id", "text", minCount = 2L)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    out.foreach { case (_, y, pred, resid) =>
      assert(resid == y - pred) // exactly, same-expression arithmetic
      assert(!pred.isNaN && !pred.isInfinite)
    }
  }

  test("distill is partitioning-invariant (pinned integer moments)") {
    val docs = (0 until 120).map { i =>
      (i.toLong, s"the word${i % 7} and token${i % 13} of text $i common the")
    }.toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      QualityModel.distill(d, "doc_id", "text", minCount = 3L)
        .as[(Long, Double, Double, Double)].collect().toSet
    assert(run(docs) == run(docs.repartition(17)))
  }

  test("distill learns an exactly-linear target up to ridge shrinkage") {
    // target y here is the OOV rate; craft a corpus where rare_frac is
    // perfectly predicted by the stopword ratio (docs are either all
    // stopwords+common or all gibberish), so the model should track it
    val docs = (
      (0 until 30).map(i => (i.toLong, "the common words repeat the common words")) ++
      (30 until 60).map(i => (i.toLong, s"gib${i}a gib${i}b gib${i}c gib${i}d gib${i}e gib${i}f gib${i}g"))
    ).toDF("doc_id", "text")
    val out = QualityModel.distill(docs, "doc_id", "text", minCount = 5L)
      .select("rare_frac", "resid").as[(Double, Double)].collect()
    // two feature-identical groups, λ tiny → residuals near zero
    assert(out.forall { case (_, r) => math.abs(r) < 1e-3 }, out.toSeq.take(5))
  }
}
