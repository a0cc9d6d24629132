package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL media codecs over the multimodal binary-column plumbing —
  * images via `javax.imageio` (PNG/JPEG/GIF/BMP) and audio via
  * `javax.sound.sampled` (WAV/PCM), both JDK-built-in: no external
  * dependency, runs headless. This retires [[Multimodal.FakeCodec]]'s
  * stub status for the image/audio modalities; video stays stubbed
  * (the JDK has no video decoder — that seam is still
  * [[Multimodal.MediaCodec]]).
  *
  * Every operator is batch-shaped (`mapPartitions`, codec state
  * initialized once per partition) and decode-failure-tolerant: at
  * 100 TB corrupt media is a statistical certainty, so undecodable
  * bytes yield a `decode_ok = false` row with null payload columns —
  * never a task failure.
  *
  * The ORACLE trick that makes a real codec value-checkable without
  * teaching DuckDB to read PNG: the test fixture renders each image's
  * pixels from a closed-form integer formula of (id, x, y), so after
  * the real encode→decode round-trip (PNG is lossless) the decoded
  * metadata, grayscale histogram, and nearest-neighbor resize stats
  * are all analytically computable in SQL. The gate therefore
  * exercises ImageIO/AudioSystem for real AND compares values exactly.
  */
object MediaCodecs {

  // ── deterministic fixtures ─────────────────────────────────────────

  /** Image geometry/pixel formulas — shared by the renderer and (in
    * SQL) the oracles. All integer math on non-negative ids. */
  def imgW(id: Long): Int = (id % 17).toInt + 8
  def imgH(id: Long): Int = (id % 13).toInt + 8
  def pxR(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  def pxG(id: Long, x: Int, y: Int): Int = ((id * 17 + x * 11 + y * 3) % 256).toInt
  def pxB(id: Long, x: Int, y: Int): Int = ((id * 23 + x * 5 + y * 19) % 256).toInt

  /** Render one PNG per row: `(key, media, media_type)` with real
    * ImageIO-encoded bytes. Fixture generator for the decode gate —
    * production corpora bring their own media bytes. */
  def renderImages(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(keyCol).cast(LongType).as("__k"))
    val outSchema = StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField("media", BinaryType, nullable = false),
      StructField("media_type", StringType, nullable = false)))
    val rows = in.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = (imgW(id), imgH(id))
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y,
              (pxR(id, x, y) << 16) | (pxG(id, x, y) << 8) | pxB(id, x, y))
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray, "image/png")
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  // ── real image decode ──────────────────────────────────────────────

  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Integer luminance — (299r + 587g + 114b)/1000, truncating — so the
    * histogram/resize stats are exact-integer SQL-mirrorable (a float
    * colorspace transform would not be). */
  private def gray(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
    (r * 299 + g * 587 + b * 114) / 1000
  }

  /** Decode metadata through the REAL codec:
    * `(key, decode_ok, width, height, n_pixels)` — nulls and
    * `decode_ok = false` for undecodable bytes. */
  def decodeImageMetadata(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(keyCol), col("media"))
    val outSchema = StructType(Seq(
      in.schema.fields(0),
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("n_pixels", LongType, nullable = true)))
    val rows = in.rdd.mapPartitions { it =>
      it.map { r =>
        readImage(r.getAs[Array[Byte]]("media")) match {
          case Some(img) => Row(r.get(0), true, img.getWidth.toLong,
            img.getHeight.toLong, img.getWidth.toLong * img.getHeight)
          case None => Row(r.get(0), false, null, null, null)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Grayscale distribution through the real decoder: 8 bins of 32
    * gray levels, as exact fractions `(key, decode_ok, h0..h7)`. */
  def imageGrayHistogram(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(keyCol), col("media"))
    val outSchema = StructType(
      (in.schema.fields(0) +:
        StructField("decode_ok", BooleanType, nullable = false) +:
        (0 until 8).map(i => StructField(s"h$i", DoubleType, nullable = true))).toIndexedSeq)
    val rows = in.rdd.mapPartitions { it =>
      it.map { r =>
        readImage(r.getAs[Array[Byte]]("media")) match {
          case Some(img) =>
            val counts = new Array[Long](8)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                counts(gray(img.getRGB(x, y)) / 32) += 1
                x += 1
              }
              y += 1
            }
            val n = img.getWidth.toLong * img.getHeight
            Row.fromSeq(r.get(0) +: true +: counts.toIndexedSeq.map(_.toDouble / n))
          case None => Row.fromSeq(r.get(0) +: false +: Seq.fill(8)(null))
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Decode → nearest-neighbor resample to `dstW`×`dstH` → re-encode
    * PNG, with exact-integer stats:
    * `(key, decode_ok, media, width, height, mean_gray)`. Source pixel
    * of (x, y) is `(x·srcW / dstW, y·srcH / dstH)` truncating — the
    * SQL-mirrorable resample (Graphics2D interpolation would not be).
    * `mean_gray` = Σgray / pixels, one exact division. */
  def resizeImagesNN(df: DataFrame, keyCol: String, dstW: Int, dstH: Int): DataFrame = {
    require(dstW >= 1 && dstH >= 1, s"target dims must be >= 1, got ${dstW}x$dstH")
    val spark = df.sparkSession
    val in = df.select(col(keyCol), col("media"))
    val outSchema = StructType(Seq(
      in.schema.fields(0),
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("media", BinaryType, nullable = true),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("mean_gray", DoubleType, nullable = true)))
    val rows = in.rdd.mapPartitions { it =>
      it.map { r =>
        readImage(r.getAs[Array[Byte]]("media")) match {
          case Some(img) =>
            val out = new java.awt.image.BufferedImage(
              dstW, dstH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var graySum = 0L
            var y = 0
            while (y < dstH) {
              var x = 0
              while (x < dstW) {
                val rgb = img.getRGB(x * img.getWidth / dstW, y * img.getHeight / dstH)
                out.setRGB(x, y, rgb)
                graySum += gray(rgb)
                x += 1
              }
              y += 1
            }
            val bos = new ByteArrayOutputStream()
            ImageIO.write(out, "png", bos)
            Row(r.get(0), true, bos.toByteArray, dstW.toLong, dstH.toLong,
              graySum.toDouble / (dstW.toLong * dstH))
          case None => Row(r.get(0), false, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  // ── real audio decode (WAV / PCM16) ────────────────────────────────

  /** Audio sample formulas — shared with the oracle: PCM16 mono 8 kHz,
    * `(id % 50) + 20` samples, sample i = `((id·7919 + i·104729) %
    * 65536) − 32768`. */
  def wavN(id: Long): Int = (id % 50).toInt + 20
  def wavSample(id: Long, i: Int): Int =
    ((id * 7919 + i.toLong * 104729) % 65536).toInt - 32768
  val WavRate = 8000

  /** Render a minimal RIFF/WAVE (PCM16 mono) per row — 44-byte header
    * + little-endian samples. Hand-written so the fixture needs no
    * encoder; decoding below goes through the REAL AudioSystem. */
  def renderWavs(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(keyCol).cast(LongType).as("__k"))
    val outSchema = StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField("media", BinaryType, nullable = false),
      StructField("media_type", StringType, nullable = false)))
    val rows = in.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val n = wavN(id)
        val dataLen = n * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1) // PCM, mono
          .putInt(WavRate).putInt(WavRate * 2) // byte rate
          .putShort(2).putShort(16) // block align, bits
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        var i = 0
        while (i < n) { bb.putShort(wavSample(id, i).toShort); i += 1 }
        Row(id, bb.array(), "audio/wav")
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Decode WAV through the real `javax.sound.sampled` reader and
    * profile the PCM16 stream:
    * `(key, decode_ok, n_samples, sample_rate, s_min, s_max, s_mean)`.
    * `s_mean` = Σsamples / n — one exact division of exact integers. */
  def decodeAudioStats(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(keyCol), col("media"))
    val outSchema = StructType(Seq(
      in.schema.fields(0),
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("n_samples", LongType, nullable = true),
      StructField("sample_rate", LongType, nullable = true),
      StructField("s_min", LongType, nullable = true),
      StructField("s_max", LongType, nullable = true),
      StructField("s_mean", DoubleType, nullable = true)))
    val rows = in.rdd.mapPartitions { it =>
      it.map { r =>
        val res =
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(r.getAs[Array[Byte]]("media")))
            try {
              val fmt = ais.getFormat
              require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
              val bytes = ais.readAllBytes()
              val bb = java.nio.ByteBuffer.wrap(bytes).order(
                if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN)
              var (mn, mx, sum, n) = (Long.MaxValue, Long.MinValue, 0L, 0L)
              while (bb.remaining() >= 2) {
                val s = bb.getShort.toLong
                if (s < mn) mn = s
                if (s > mx) mx = s
                sum += s; n += 1
              }
              if (n == 0) None
              else Some((n, fmt.getSampleRate.toLong, mn, mx, sum.toDouble / n))
            } finally ais.close()
          } catch { case _: Exception => None }
        res match {
          case Some((n, rate, mn, mx, mean)) =>
            Row(r.get(0), true, n, rate, mn, mx, mean)
          case None => Row(r.get(0), false, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
