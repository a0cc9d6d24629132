package graft

import graft.operators.LmScore

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = ((0 until 40).map { i =>
    (i.toLong, "the cat sat on the mat and the dog slept near the door")
  } ++ Seq(
    (100L, "the cat sat on the mat"),          // pure in-distribution
    (101L, "zxqv wjfk pmtr ylbd hgcn"),        // OOV gibberish
    (102L, "")                                  // empty
  )).toDF("doc_id", "text")

  test("in-distribution text outscores OOV gibberish; empty doc scores 0") {
    val out = LmScore.score(corpus, "doc_id", "text", vocabSize = 50, bigramCap = 200)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 43)
    val (_, nIn, sIn) = out(100L)
    val (_, nOov, sOov) = out(101L)
    assert(nIn == 6 && nOov == 5)
    assert(sIn > sOov, s"$sIn should beat $sOov")
    assert(out(102L) == ((102L, 0L, 0.0)))
    // scores are probabilities-means: always within (0, 1] for non-empty
    assert(out.values.filter(_._1 != 102L).forall(r => r._3 > 0.0 && r._3 <= 1.0))
  }

  test("score is partitioning-invariant (pinned per-doc mean)") {
    def run(d: org.apache.spark.sql.DataFrame) =
      LmScore.score(d, "doc_id", "text", vocabSize = 30, bigramCap = 100)
        .as[(Long, Long, Double)].collect().toSet
    assert(run(corpus) == run(corpus.repartition(11)))
  }

  test("vocabulary cap binds: tiny vocab collapses rare words to UNK, score still defined") {
    val out = LmScore.score(corpus, "doc_id", "text", vocabSize = 2, bigramCap = 5)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 43)
    assert(out.filter(_._1 != 102L).forall(r => r._3 > 0.0))
  }

  test("buckets: tied scores share a bucket; labels follow the score order") {
    val out = LmScore.buckets(corpus, "doc_id", "text", vocabSize = 50, bigramCap = 200)
      .as[(Long, Long, Double, String)].collect()
    assert(out.length == 43)
    val byId = out.map(r => r._1 -> r).toMap
    // the 40 identical docs score identically → min-rank puts them all
    // in ONE bucket regardless of partitioning
    val dupBuckets = (0 until 40).map(i => byId(i.toLong)._4).toSet
    assert(dupBuckets.size == 1, s"tied docs split across $dupBuckets")
    // empty doc (score 0.0) and OOV gibberish sit at the bottom: tail
    assert(byId(102L)._4 == "tail" && byId(101L)._4 == "tail")
    // bucket label is monotone in score: every head score >= every
    // middle score >= every tail score
    def scores(b: String) = out.filter(_._4 == b).map(_._3)
    for (h <- scores("head"); m <- scores("middle")) assert(h >= m)
    for (m <- scores("middle"); t <- scores("tail")) assert(m >= t)
  }

  test("buckets are partitioning-invariant") {
    def run(d: org.apache.spark.sql.DataFrame) =
      LmScore.buckets(d, "doc_id", "text", vocabSize = 30, bigramCap = 100)
        .as[(Long, Long, Double, String)].collect().toSet
    assert(run(corpus) == run(corpus.repartition(7)))
  }
}
