package graft

import graft.operators.Multimodal

/** The codec-seam contract (VERDICT r5 stretch): a future REAL decoder
  * implements [[Multimodal.MediaCodec]] and slots into the frame
  * pipeline without any schema or plumbing change. This spec drives
  * the pipeline with a second, structurally different codec and pins
  * that only the decoded payloads move — schema, row count, and frame
  * indices are codec-invariant.
  */
class MultimodalCodecContractSpec extends SparkSpec {
  import spark.implicits._

  /** A stand-in "real" decoder: different bytes, same interface. */
  private object ReverseCodec extends Multimodal.MediaCodec {
    def decode(media: Array[Byte], frameIdx: Long): Array[Byte] =
      media.reverse ++ Array(frameIdx.toByte)
  }

  private def mediaDf = Multimodal.attachFakeBinary(
    (1 to 20).map(i => (i.toLong, s"document body number $i with some text")).toDF("id", "text"),
    "id", "text")

  test("any MediaCodec slots in without schema change; only payloads move") {
    val stub = Multimodal.sampleFrames(mediaDf, "id")
    val real = Multimodal.sampleFrames(mediaDf, "id", codec = ReverseCodec)
    // identical schema — the contract a swapped-in decoder relies on
    assert(real.schema == stub.schema)
    val s = stub.orderBy("id", "frame_idx").collect()
    val r = real.orderBy("id", "frame_idx").collect()
    // frame explosion is metadata-driven, not codec-driven
    assert(s.map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      r.map(x => (x.getLong(0), x.getLong(1))).toSeq)
    // and the codec is actually the thing producing the payloads
    assert(s.map(_.getString(2)).toSeq != r.map(_.getString(2)).toSeq)
  }
}
