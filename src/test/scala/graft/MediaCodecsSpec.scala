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

  test("imageDHash: identical images collide, distinct differ, uniform hashes to zero") {
    // duplicates by construction: two keys rendering the same pixel seed
    val rendered = MediaCodecs.renderImages(ids, "doc_id")
    val dup = MediaCodecs.renderImages(Seq(42L).toDF("doc_id"), "doc_id")
      .withColumn("doc_id", lit(1042L))
    val out = MediaCodecs.imageDHash(rendered.unionByName(dup), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(42L) === out(1042L), "same pixels must produce the same dhash")
    assert(out.values.toSeq.distinct.size >= 4, "distinct images should mostly differ")
    assert(out.values.forall(_.matches("[0-9a-f]{16}")))

    // a uniform image has no left-right gradients anywhere → all-zero hash
    val uniform = {
      val img = new java.awt.image.BufferedImage(10, 10,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 10).foreach(y => (0 until 10).foreach(x => img.setRGB(x, y, 0x808080)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Seq((1L, bos.toByteArray, "image/png")).toDF("doc_id", "media", "media_type")
    }
    assert(MediaCodecs.imageDHash(uniform, "doc_id").collect().head.getString(2)
      === "0000000000000000")

    // corrupt bytes: flagged, null hash (never a colliding sentinel)
    val corrupt = Seq((999L, Array[Byte](1, 2, 3), "image/png"))
      .toDF("doc_id", "media", "media_type")
    val bad = MediaCodecs.imageDHash(corrupt, "doc_id").collect().head
    assert(!bad.getBoolean(1) && bad.isNullAt(2))
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

  test("raw-DIB AVI round-trip is lossless: frame stats equal the formula") {
    val out = MediaCodecs.sampleVideoFrames(
      MediaCodecs.renderAvis(ids, "doc_id"), "doc_id", everyNth = 2)
      .orderBy("doc_id", "frame_idx").collect()
    val expected = for {
      id <- Seq(0L, 7L, 42L, 255L)
      f <- 0 until MediaCodecs.vidFrames(id) by 2
    } yield {
      val (w, h) = (MediaCodecs.vidW(id), MediaCodecs.vidH(id))
      val sum = (for (y <- 0 until h; x <- 0 until w) yield
        (MediaCodecs.vpxR(id, f, x, y) * 299 + MediaCodecs.vpxG(id, f, x, y) * 587 +
          MediaCodecs.vpxB(id, f, x, y) * 114) / 1000).map(_.toLong).sum
      (id, f.toLong, w.toLong, h.toLong, sum.toDouble / (w * h))
    }
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, (id, f, w, h, mg)) =>
      assert(r.getLong(0) == id && r.getBoolean(1) && r.getLong(2) == f)
      assert(r.getLong(3) == w && r.getLong(4) == h)
      assert(r.getDouble(5) == mg, s"mean_gray id=$id f=$f")
    }
  }

  test("decodeVideoMetadata reads container geometry, frame count and fps") {
    val out = MediaCodecs.decodeVideoMetadata(
      MediaCodecs.renderAvis(ids, "doc_id"), "doc_id").orderBy("doc_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(1))
      assert(r.getLong(2) == MediaCodecs.vidW(id).toLong)
      assert(r.getLong(3) == MediaCodecs.vidH(id).toLong)
      assert(r.getLong(4) == MediaCodecs.vidFrames(id).toLong)
      assert(r.getDouble(5) == MediaCodecs.VidFps.toDouble)
    }
  }

  test("MJPEG AVI decodes through the same parser; JPEG loss stays bounded") {
    // JPEG is lossy, so the MJPG chunk path is gated here (structure
    // exact, pixels within a tolerance) instead of by the SQL oracle
    val meta = MediaCodecs.decodeVideoMetadata(
      MediaCodecs.renderMjpegAvis(ids, "doc_id"), "doc_id").orderBy("doc_id").collect()
    meta.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(1), s"MJPG decode failed for id=$id")
      assert(r.getLong(2) == MediaCodecs.vidW(id).toLong &&
        r.getLong(3) == MediaCodecs.vidH(id).toLong &&
        r.getLong(4) == MediaCodecs.vidFrames(id).toLong)
    }
    val frames = MediaCodecs.sampleVideoFrames(
      MediaCodecs.renderMjpegAvis(ids, "doc_id"), "doc_id", everyNth = 1)
      .orderBy("doc_id", "frame_idx").collect()
    frames.foreach { r =>
      val (id, f) = (r.getLong(0), r.getLong(2).toInt)
      val (w, h) = (MediaCodecs.vidW(id), MediaCodecs.vidH(id))
      val exact = (for (y <- 0 until h; x <- 0 until w) yield
        (MediaCodecs.vpxR(id, f, x, y) * 299 + MediaCodecs.vpxG(id, f, x, y) * 587 +
          MediaCodecs.vpxB(id, f, x, y) * 114) / 1000).map(_.toLong).sum.toDouble / (w * h)
      // the fixture pixels are high-frequency noise — JPEG's worst
      // case — but the MEAN luminance survives quantization closely
      assert(math.abs(r.getDouble(5) - exact) < 16.0,
        s"MJPG mean_gray drifted ${r.getDouble(5)} vs $exact (id=$id f=$f)")
    }
  }

  test("audio-first AVI muxes decode: frames matched by the video stream's index") {
    // audio stream declared first in hdrl → video frames are '01db'
    // chunks and its headers are stream 1's; a parser that assumed
    // stream 0 would return zero frames (decode_ok=false) or pair the
    // audio stream's timing with the video geometry
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = Seq(7L, 42L).map(id =>
      Row(id, MediaCodecs.buildTestAviAudioFirst(id), "video/x-msvideo"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("media", BinaryType, nullable = false),
        StructField("media_type", StringType, nullable = false))))
    val meta = MediaCodecs.decodeVideoMetadata(df, "doc_id").orderBy("doc_id").collect()
    meta.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(1), s"audio-first AVI failed to decode for id=$id")
      assert(r.getLong(2) == MediaCodecs.vidW(id).toLong &&
        r.getLong(3) == MediaCodecs.vidH(id).toLong &&
        r.getLong(4) == MediaCodecs.vidFrames(id).toLong &&
        r.getDouble(5) == MediaCodecs.VidFps.toDouble)
    }
    // frame pixels decode identically to the single-stream layout
    val fr = MediaCodecs.sampleVideoFrames(df, "doc_id", everyNth = 1)
      .orderBy("doc_id", "frame_idx").collect()
    assert(fr.length == MediaCodecs.vidFrames(7L) + MediaCodecs.vidFrames(42L))
    fr.foreach { r =>
      val (id, f) = (r.getLong(0), r.getLong(2).toInt)
      val (w, h) = (MediaCodecs.vidW(id), MediaCodecs.vidH(id))
      val exact = (for (y <- 0 until h; x <- 0 until w) yield
        (MediaCodecs.vpxR(id, f, x, y) * 299 + MediaCodecs.vpxG(id, f, x, y) * 587 +
          MediaCodecs.vpxB(id, f, x, y) * 114) / 1000).map(_.toLong).sum.toDouble / (w * h)
      assert(r.getBoolean(1) && r.getDouble(5) == exact)
    }
  }

  test("JUNK padding and idx1 index chunks are skipped like real-world AVIs need") {
    // virtually every mux inserts JUNK alignment padding and an idx1
    // index; the walk must skip unknown chunk ids at any level
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = MediaCodecs.renderAvis(Seq(42L).toDF("doc_id"), "doc_id")
      .collect().head.getAs[Array[Byte]]("media")
    def le(i: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(i).array()
    }
    val junk = "JUNK".getBytes("US-ASCII") ++ le(16) ++ Array.fill[Byte](16)(0)
    val idx1 = "idx1".getBytes("US-ASCII") ++ le(16) ++
      ("00db".getBytes("US-ASCII") ++ le(16) ++ le(4) ++ le(720))
    // splice JUNK after the RIFF header (before hdrl), idx1 at the end,
    // and patch the outer RIFF size
    val spliced = base.take(12) ++ junk ++ base.drop(12) ++ idx1
    val szBuf = java.nio.ByteBuffer.wrap(spliced, 4, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    szBuf.put(le(spliced.length - 8))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(42L, spliced, "video/x-msvideo"))),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("media", BinaryType, nullable = false),
        StructField("media_type", StringType, nullable = false))))
    val meta = MediaCodecs.decodeVideoMetadata(df, "doc_id").collect().head
    assert(meta.getBoolean(1) && meta.getLong(2) == MediaCodecs.vidW(42L).toLong &&
      meta.getLong(4) == MediaCodecs.vidFrames(42L).toLong)
    val fr = MediaCodecs.sampleVideoFrames(df, "doc_id", everyNth = 1).collect()
    assert(fr.length == MediaCodecs.vidFrames(42L) && fr.forall(_.getBoolean(1)))
  }

  test("corrupt / truncated AVI bytes flag, not fail") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val goodBytes = MediaCodecs.renderAvis(Seq(7L).toDF("doc_id"), "doc_id")
      .collect().head.getAs[Array[Byte]]("media")
    val rows = Seq(
      Row(1L, "RIFFnope not an avi".getBytes("UTF-8"), "video/x-msvideo"),
      Row(2L, goodBytes.take(goodBytes.length / 2), "video/x-msvideo"), // truncated
      Row(3L, Array.emptyByteArray, "video/x-msvideo"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("media", BinaryType, nullable = false),
        StructField("media_type", StringType, nullable = false))))
    val meta = MediaCodecs.decodeVideoMetadata(df, "doc_id").collect()
    assert(meta.length == 3 && meta.forall(r => !r.getBoolean(1) && r.isNullAt(2)))
    val fr = MediaCodecs.sampleVideoFrames(df, "doc_id").collect()
    assert(fr.length == 3 && fr.forall(r => !r.getBoolean(1) && r.getLong(2) == -1L))
  }
}
