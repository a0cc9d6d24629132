package graft

import graft.operators.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target distribution: clean English prose; raw corpus mixes
  // target-like docs with gibberish
  private def target = (1L to 30L).map(i =>
    (i, "the quick brown fox jumps over the lazy dog near the river bank"))
    .toDF("doc_id", "text")
  private def raw = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"), // target-like
    (101L, "zxqv wjfk pmtr ylbd hgcn vvrt qqpz mmkl"),     // off-target
    (102L, "")                                             // gramless
  ).toDF("doc_id", "text")

  test("target-like text outweighs off-target gibberish; gramless doc weighs 0") {
    val out = Dsir.dsirWeights(raw, target, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 3)
    assert(out(100L)._3 > out(101L)._3,
      s"${out(100L)._3} should beat ${out(101L)._3}")
    assert(out(102L) == ((102L, 0L, 0.0)))
    // unigrams + bigrams: n tokens → 2n-1 gram positions
    assert(out(100L)._2 == 17L && out(101L)._2 == 15L)
  }

  test("weights are partitioning-invariant (pinned per-doc mean)") {
    val bigRaw = (1L to 60L).map(i => (i, s"doc $i the quick brown fox token$i"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dsir.dsirWeights(d, target, "doc_id", "text", buckets = 512)
        .as[(Long, Long, Double)].collect().toSet
    assert(run(bigRaw) == run(bigRaw.repartition(11)))
  }

  test("bucket cap binds: weights stay defined and positive at tiny bucket counts") {
    val out = Dsir.dsirWeights(raw, target, "doc_id", "text", buckets = 4)
      .as[(Long, Long, Double)].collect()
    assert(out.filter(_._1 != 102L).forall(r => r._3 > 0.0))
  }
}
