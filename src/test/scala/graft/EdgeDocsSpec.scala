package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.functions.TextFunctions
import graft.operators.{Multimodal, PipelineOps, Similarity}

/** Degenerate-document conventions, pinned after the cross-engine
  * edge-fixture sweep (NULL text, empty text, whitespace-only text,
  * zero-norm embeddings — the rows a real 100 TB crawl is full of and
  * the small gate fixtures never contain).
  *
  * The shared convention: document-level SIGNALS treat NULL text as
  * the empty document (tokenCount 0, simhash 0, zero-byte media
  * payload), while the raw tokenizers stay null-propagating like
  * `regexp_extract_all`. Zero-norm embeddings score cosine 0.0 —
  * never NaN, whose ordering differs across engines (Spark ranks NaN
  * above every real neighbor; a single zero vector would win every
  * `.desc` top-k).
  */
class EdgeDocsSpec extends SparkSpec {
  import spark.implicits._

  private def edgeDocs = Seq(
    (1L, "plain words here"),
    (2L, null.asInstanceOf[String]),
    (3L, ""),
    (4L, "   "),
    (5L, "\n\n")
  ).toDF("doc_id", "text")

  test("tokenCount and simhash treat NULL text as the empty document") {
    val rows = edgeDocs.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n"),
        TextFunctions.simhash(col("text")).as("sh"))
      .collect()
    rows.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2),
        s"doc ${r.getLong(0)}: token/simhash signals must never be NULL")
    }
    val byId = rows.map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(byId(1L)._1 === 3)
    Seq(2L, 3L, 4L, 5L).foreach { id =>
      assert(byId(id) === ((0, 0L)), s"doc $id: token-less docs are (0, simhash 0)")
    }
  }

  test("raw tokens stays null-propagating (mirrors regexp_extract_all)") {
    val r = edgeDocs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .where(col("doc_id") === 2L).collect().head
    assert(r.isNullAt(1), "tokens(NULL) must stay NULL like regexp_extract_all")
  }

  test("zero-norm embeddings score cosine 0.0, never NaN, and never enter top-k over real neighbors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 0.0f)), // zero vector
      (3L, Array(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val c = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    c.foreach { case (k, v) => assert(!v.isNaN, s"$k produced NaN") }
    assert(c((2L, 2L)) === 0.0, "zero vs itself is 0.0, not NaN or 1.0")
    assert(c((2L, 0L)) === 0.0 && c((0L, 2L)) === 0.0)
    val top = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0L),
        "vec_id", "embedding", k = 2)
      .orderBy(col("rank")).collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(top === Seq(1L, 3L), s"zero vector must rank below real neighbors, got $top")
  }

  test("multimodal plumbing never fails on NULL-text docs (zero-byte payload)") {
    val withBin = Multimodal.attachFakeBinary(edgeDocs, "doc_id", "text")
    assert(withBin.where(col("media").isNull).count() === 0L)
    val feats = Multimodal.extractFeatures(withBin, "doc_id")
    assert(feats.count() === 5L)
    // NULL and '' digest identically (zero-byte payload convention)
    val f = feats.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(f(2L) === f(3L))
    val frames = Multimodal.sampleFrames(withBin, "doc_id", everyNth = 10)
    assert(frames.where(col("doc_id") === 2L).count() >= 1L,
      "zero-byte media still yields its n_frames=1 row")
  }

  test("span decontamination rebuilds fully-contaminated docs to '' (never NULL)") {
    val probe = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c d e"),            // fully covered -> ''
      (2L, "x y z unrelated words"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = PipelineOps.decontaminateSpans(corpus, probe, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === (("", 5L, 5L)), "fully-excised doc rebuilds to empty string")
    assert(out(3L) === (("", 0L, 0L)), "NULL doc flows through as the empty document")
    assert(out(2L)._3 === 0L)
  }
}
