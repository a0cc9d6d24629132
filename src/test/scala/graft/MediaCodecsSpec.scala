package graft

import org.apache.spark.sql.functions._
import graft.operators.MediaCodecs

class MediaCodecsSpec extends SparkSpec {
  import spark.implicits._

  private def ids = Seq(0L, 7L, 42L, 255L).toDF("doc_id")

  test("PNG round-trip is lossless: decoded pixels equal the rendered formula") {
    val rendered = MediaCodecs.renderImages(ids, "doc_id").collect()
    rendered.foreach { row =>
      val id = row.getLong(0)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("media")))
      assert(img.getWidth == MediaCodecs.imgW(id) && img.getHeight == MediaCodecs.imgH(id))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xFF) == MediaCodecs.pxR(id, x, y), s"R mismatch id=$id ($x,$y)")
        assert(((rgb >> 8) & 0xFF) == MediaCodecs.pxG(id, x, y), s"G mismatch id=$id ($x,$y)")
        assert((rgb & 0xFF) == MediaCodecs.pxB(id, x, y), s"B mismatch id=$id ($x,$y)")
      }
    }
  }

  test("decodeImageMetadata reads real dimensions; corrupt bytes flag, not fail") {
    val good = MediaCodecs.renderImages(ids, "doc_id")
    val corrupt = Seq((999L, "this is not a png".getBytes("UTF-8"), "image/png"))
      .toDF("doc_id", "media", "media_type")
    val out = MediaCodecs.decodeImageMetadata(good.unionByName(corrupt), "doc_id")
      .orderBy("doc_id").collect()
    assert(out.take(4).forall(_.getBoolean(1)))
    assert(out(2).getLong(2) == MediaCodecs.imgW(42L) && out(2).getLong(3) == MediaCodecs.imgH(42L))
    val bad = out.last
    assert(bad.getLong(0) == 999L && !bad.getBoolean(1) && bad.isNullAt(2))
  }

  test("imageGrayHistogram fractions sum to 1 for decodable rows") {
    val out = MediaCodecs.imageGrayHistogram(
      MediaCodecs.renderImages(ids, "doc_id"), "doc_id").collect()
    out.foreach { r =>
      val s = (2 until 10).map(r.getDouble).sum
      assert(math.abs(s - 1.0) < 1e-12, s"histogram sums to $s")
    }
  }

  test("resizeImagesNN re-encodes a valid 8x8 PNG with formula-mapped pixels") {
    val out = MediaCodecs.resizeImagesNN(
      MediaCodecs.renderImages(Seq(42L).toDF("doc_id"), "doc_id"), "doc_id", 8, 8)
      .collect().head
    assert(out.getBoolean(1) && out.getLong(3) == 8L && out.getLong(4) == 8L)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]]("media")))
    assert(img.getWidth == 8 && img.getHeight == 8)
    val (w, h) = (MediaCodecs.imgW(42L), MediaCodecs.imgH(42L))
    for (y <- 0 until 8; x <- 0 until 8) {
      val (sx, sy) = (x * w / 8, y * h / 8)
      assert(((img.getRGB(x, y) >> 16) & 0xFF) == MediaCodecs.pxR(42L, sx, sy),
        s"NN-resampled pixel ($x,$y) must come from source ($sx,$sy)")
    }
  }

  test("decodeAudioStats reads the real WAV stream; stats match the formula") {
    val out = MediaCodecs.decodeAudioStats(
      MediaCodecs.renderWavs(ids, "doc_id"), "doc_id").orderBy("doc_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val n = MediaCodecs.wavN(id)
      val samples = (0 until n).map(MediaCodecs.wavSample(id, _))
      assert(r.getBoolean(1))
      assert(r.getLong(2) == n.toLong)
      assert(r.getLong(3) == MediaCodecs.WavRate.toLong)
      assert(r.getLong(4) == samples.min.toLong && r.getLong(5) == samples.max.toLong)
      assert(r.getDouble(6) == samples.map(_.toLong).sum.toDouble / n)
    }
  }

  test("corrupt audio bytes flag, not fail") {
    val corrupt = Seq((1L, "RIFFnope".getBytes("UTF-8"), "audio/wav"))
      .toDF("doc_id", "media", "media_type")
    val out = MediaCodecs.decodeAudioStats(corrupt, "doc_id").collect().head
    assert(!out.getBoolean(1) && out.isNullAt(2))
  }
}
