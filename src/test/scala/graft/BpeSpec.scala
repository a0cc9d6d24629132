package graft

import graft.functions.Bpe
import graft.operators.BpeTokenizer

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("codePointSplit: code points, not UTF-16 chars") {
    assert(Bpe.codePointSplit("abc").toSeq == Seq("a", "b", "c"))
    assert(Bpe.codePointSplit("日本語").toSeq == Seq("日", "本", "語"))
    // U+1D11E (musical G clef) is a surrogate pair in UTF-16 — must be
    // ONE token (DuckDB substr(w,i,1) character semantics)
    val clef = new String(Character.toChars(0x1D11E))
    assert(Bpe.codePointSplit(s"a${clef}b").toSeq == Seq("a", clef, "b"))
  }

  test("applyMerge equals leftmost-greedy skip-scan on adversarial runs") {
    def greedy(toks: Array[String], a: String, b: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toArray
    }
    val cases = Seq(
      ("aaaa", "a", "a"), ("aaa", "a", "a"), ("abab", "a", "b"),
      ("aabb", "a", "b"), ("abba", "b", "a"), ("bbbb", "b", "b"),
      ("abcabc", "b", "c"))
    for ((s, a, b) <- cases) {
      val toks = s.map(_.toString).toArray
      assert(Bpe.applyMerge(toks, a, b).toSeq == greedy(toks, a, b).toSeq,
        s"mismatch on $s merging ($a,$b)")
    }
  }

  test("train learns the dominant pair first; sentinel pads exhausted rounds") {
    val docs = Seq(
      (1L, "abab abab"), (2L, "ab ab ab"), (3L, "ba")
    ).toDF("doc_id", "text")
    val merges = BpeTokenizer.train(docs, "doc_id", "text", numMerges = 12)
    assert(merges.length == 12)
    assert(merges.head == (("a", "b"))) // 'ab' pair dominates every doc
    // a tiny corpus runs out of pairs; later rounds must be sentinels
    assert(merges.last == BpeTokenizer.Sentinel)
  }

  test("trainEncode: counts consistent, fingerprint gates content, partition-invariant") {
    val docs = (0 until 60).map { i =>
      (i.toLong, s"banana band${i % 5} bandana an${i % 3}a")
    }.toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      BpeTokenizer.trainEncode(d, "doc_id", "text", numMerges = 8)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val out = run(docs)
    assert(out.length == 60)
    out.foreach { case (_, nWords, nBpe, _) =>
      assert(nWords == 4)
      assert(nBpe >= nWords) // merges never cross word boundaries
      assert(nBpe <= "banana bandX bandana anXa".count(_ != ' ') + 2)
    }
    assert(out == run(docs.repartition(7)))
    // merging strictly reduces token count vs no merges at all
    val raw = BpeTokenizer.encode(docs, "doc_id", "text", Seq.empty)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out.map(_._3).sum < raw.map(_._3).sum)
  }
}
