package graft

import graft.operators.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog chased the zephyr balloon"),
    (3L, "a zephyr is a gentle breeze"),
    (4L, "the the the the the the"),
    (5L, "cat videos online")
  ).toDF("doc_id", "text")

  test("rare query terms dominate: zephyr retrieves its docs above stopword soup") {
    val qs = Seq((100L, "zephyr breeze")).toDF("doc_id", "text")
    val out = Bm25.bm25TopK(corpus, qs, "doc_id", "text", k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    // doc 3 matches both rare terms → top; doc 2 matches one
    assert(out.head._2 == 3L, out.toSeq.toString)
    assert(out(1)._2 == 2L)
    // stopword-only docs never enter (no matching term)
    assert(!out.exists(_._2 == 4L))
  }

  test("tf saturates and length normalization penalizes the long stopword doc") {
    val qs = Seq((100L, "the cat")).toDF("doc_id", "text")
    val out = Bm25.bm25TopK(corpus, qs, "doc_id", "text", k = 5)
      .as[(Long, Long, Double, Int)].collect()
    val byDoc = out.map(r => r._2 -> r._3).toMap
    // doc 1 matches 'the' AND rarer 'cat'; doc 4 is only repeated 'the'
    assert(byDoc(1L) > byDoc(4L))
    // every score positive, ranks contiguous from 1
    assert(out.map(_._4).sorted.toSeq == (1 to out.length))
    assert(out.forall(_._3 > 0.0))
  }

  test("scores are partitioning-invariant (pinned term sum)") {
    val docs = (1L to 120L).map(i =>
      (i, s"common filler w${i % 7} token${i % 13} tail$i")).toDF("doc_id", "text")
    val qs = Seq((900L, "w3 token5 common"), (901L, "w1 tail17")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Bm25.bm25TopK(d, qs, "doc_id", "text", k = 10)
        .as[(Long, Long, Double, Int)].collect().toSet
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("unmatched queries return no rows; matched ones cap at k") {
    val qs = Seq((100L, "qqqzzz unseen"), (101L, "cat")).toDF("doc_id", "text")
    val out = Bm25.bm25TopK(corpus, qs, "doc_id", "text", k = 1)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.forall(_._1 == 101L) && out.length == 1)
  }
}
