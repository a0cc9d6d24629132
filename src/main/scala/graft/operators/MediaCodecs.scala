package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL media codecs over the multimodal binary-column plumbing —
  * images via `javax.imageio` (PNG/JPEG/GIF/BMP), audio via
  * `javax.sound.sampled` (WAV/PCM), and video via a hand-rolled AVI
  * RIFF container walk (raw-DIB frames decoded directly, MJPEG frames
  * through ImageIO) — all JDK-built-in: no external dependency, runs
  * headless. This retires [[Multimodal.FakeCodec]]'s stub status for
  * every JDK-reachable format; the [[Multimodal.MediaCodec]] seam
  * remains only for codecs beyond the JDK (H.264/VP9/…).
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

  // ImageIO's stream cache is DISK-BACKED by default: every encode and
  // decode creates (and deletes) a temp file, so an image query churns
  // thousands of tiny files per pass — per-row I/O whose cost tracks
  // host disk/page-cache state (the round-14 q_image_histogram
  // variance watch item). Memory-backed streams are result-identical
  // (same codec, same bytes); the images here are row-sized, never
  // larger than a task can hold. The object initializer runs once per
  // JVM wherever these codecs execute — executors included, since the
  // mapPartitions closures reference this object's methods. Belt and
  // braces (round-15 advice): every ImageIO call site below ALSO runs
  // the idempotent, effectively-free setter first, so the setting can
  // never depend on classload order if a future path reaches ImageIO
  // without touching this initializer.
  ImageIO.setUseCache(false)

  /** Idempotent static-field write — safe to repeat per call. */
  @inline private def noDiskCache(): Unit = ImageIO.setUseCache(false)

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
        noDiskCache()
        ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray, "image/png")
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  // ── real image decode ──────────────────────────────────────────────

  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try { noDiskCache(); Option(ImageIO.read(new ByteArrayInputStream(bytes))) }
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

  /** One decoded-metadata row — the typed twin of
    * [[decodeImageMetadata]]'s schema (the streaming spelling needs an
    * Encoder, so the generic Row path can't be reused there). */
  final case class ImageMetaRow(key: Long, decode_ok: Boolean,
      width: Option[Long], height: Option[Long], n_pixels: Option[Long])

  /** Streaming-capable twin of [[decodeImageMetadata]] — the crawl
    * ingestion shape, where image payloads arrive on a continuous
    * stream. The batch op runs the JDK decoder through `.rdd`, which
    * is illegal on a streaming frame; this spells the IDENTICAL
    * per-row decode as a typed `Dataset.mapPartitions`, which
    * Structured Streaming executes as a stateless projection — no
    * watermark, no state store, one decode per arriving row, corrupt
    * bytes still yield `decode_ok = false` rows. Works on batch frames
    * too (value parity with the batch op is spec-pinned), and the same
    * spelling lifts any decode op in this module onto a stream.
    * Integral key contract (the Encoder fixes the key type — the same
    * rule as the streaming dedup ops). */
  def decodeImageMetadataStream(df: DataFrame, keyCol: String): DataFrame = {
    val idType = df.schema(keyCol).dataType
    require(Set[DataType](LongType, IntegerType, ShortType, ByteType)
        .contains(idType),
      s"decodeImageMetadataStream needs an integral $keyCol (got $idType); " +
        "the batch decodeImageMetadata accepts any key type")
    val session = df.sparkSession
    import session.implicits._
    df.select(col(keyCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (k, media) =>
          readImage(media) match {
            case Some(img) => ImageMetaRow(k, decode_ok = true,
              Some(img.getWidth.toLong), Some(img.getHeight.toLong),
              Some(img.getWidth.toLong * img.getHeight))
            case None => ImageMetaRow(k, decode_ok = false, None, None, None)
          }
        }
      }
      .toDF(keyCol, "decode_ok", "width", "height", "n_pixels")
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
            noDiskCache()
            ImageIO.write(out, "png", bos)
            Row(r.get(0), true, bos.toByteArray, dstW.toLong, dstH.toLong,
              graySum.toDouble / (dstW.toLong * dstH))
          case None => Row(r.get(0), false, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Perceptual difference-hash (dHash) through the real decoder: the
    * standard near-dup primitive for image corpora. Decode → 9×8
    * grayscale grid by the same truncating nearest-neighbor resample
    * as [[resizeImagesNN]] (`sx = x·srcW/9`, `sy = y·srcH/8`) and the
    * same integer luminance — so the whole hash is exact-integer and
    * SQL-mirrorable — then 64 bits, row-major MSB-first, bit (x,y) set
    * iff `gray(x,y) > gray(x+1,y)`, emitted as 16 lowercase hex chars.
    *
    * Identical images always collide; near-identical images (resize /
    * re-encode / small edits) usually collide or sit within a few bits
    * — exact-match dedup on the hash is the conservative corpus-scale
    * policy (a Hamming-radius join would reuse the SimHash pigeonhole
    * machinery, `Dedup.simhashCandidates`).
    *
    * Returns `(key, decode_ok, dhash)`; undecodable bytes get
    * `decode_ok = false` and a null hash (never a colliding sentinel).
    */
  def imageDHash(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(keyCol), col("media"))
    val outSchema = StructType(Seq(
      in.schema.fields(0),
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("dhash", StringType, nullable = true)))
    val rows = in.rdd.mapPartitions { it =>
      it.map { r =>
        readImage(r.getAs[Array[Byte]]("media")) match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            val g = Array.ofDim[Int](9, 8)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 9) {
                g(x)(y) = gray(img.getRGB(x * w / 9, y * h / 8))
                x += 1
              }
              y += 1
            }
            var acc = 0L
            y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                acc = (acc << 1) | (if (g(x)(y) > g(x + 1)(y)) 1L else 0L)
                x += 1
              }
              y += 1
            }
            Row(r.get(0), true, f"$acc%016x")
          case None => Row(r.get(0), false, null)
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

  // ── real video decode (AVI RIFF container: raw-DIB + MJPEG) ────────
  //
  // The JDK ships no video "codec" class, but AVI is a RIFF container
  // and its two classic payloads are decodable with pure JDK: BI_RGB
  // (uncompressed bottom-up BGR DIB — byte interpretation) and MJPG
  // (each frame is a baseline JPEG — ImageIO). Parsing the container
  // for real (hdrl stream headers, BITMAPINFOHEADER, movi chunk walk,
  // word alignment) retires the last stubbed modality for these
  // formats; anything else (H.264/VP9/…) still needs an external
  // decoder behind [[Multimodal.MediaCodec]].
  //
  // Fixture uses raw-DIB frames because BI_RGB is LOSSLESS — the
  // closed-form (id, frame, x, y) pixel formulas survive the
  // encode→decode round-trip exactly, so frame stats are analytic SQL
  // (the PNG trick, one modality over). MJPEG is lossy, so its path is
  // spec-gated with a tolerance instead (MediaCodecsSpec).

  /** Video geometry/pixel formulas — shared by the renderer and (in
    * SQL) the oracles. All integer math on non-negative ids. */
  def vidW(id: Long): Int = (id % 11).toInt + 8
  def vidH(id: Long): Int = (id % 9).toInt + 8
  def vidFrames(id: Long): Int = (id % 6).toInt + 2
  def vpxR(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 41 + x * 7 + y * 13) % 256).toInt
  def vpxG(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 17 + f * 29 + x * 11 + y * 3) % 256).toInt
  def vpxB(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 23 + f * 37 + x * 5 + y * 19) % 256).toInt
  val VidFps = 10
  /** q_video_frames' sampling stride, shared by the Spark query and
    * the oracle SQL builder so they cannot drift independently (the
    * GateKeyBound/GateEpochs convention). */
  val GateFrameStride = 2

  private def cc(s: String): Int = {
    require(s.length == 4)
    (s(0) & 0xFF) | ((s(1) & 0xFF) << 8) | ((s(2) & 0xFF) << 16) | ((s(3) & 0xFF) << 24)
  }
  private val RIFF = cc("RIFF"); private val AVI = cc("AVI ")
  private val LIST = cc("LIST"); private val HDRL = cc("hdrl")
  private val STRL = cc("strl"); private val STRH = cc("strh")
  private val STRF = cc("strf"); private val MOVI = cc("movi")
  private val VIDS = cc("vids"); private val MJPG = cc("MJPG")
  private val DB00 = cc("00db"); private val DC00 = cc("00dc")

  /** One word-aligned RIFF chunk: id + size + body (+ pad byte). The
    * single spelling of the alignment/size arithmetic — shared by the
    * production fixture builder and the test mux builders so they can
    * never emit differently-shaped envelopes. */
  private def chunk(id: Int, body: Array[Byte]): Array[Byte] = {
    val pad = body.length % 2
    val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(id).putInt(body.length).put(body)
    bb.array()
  }

  /** A RIFF LIST envelope around `body` (size covers the 4-byte type). */
  private def list(listType: Int, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(LIST).putInt(4 + body.length).putInt(listType).put(body)
    bb.array()
  }

  private def riff(body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(RIFF).putInt(4 + body.length).putInt(AVI).put(body)
    bb.array()
  }

  /** One AVI file: header lists + `00db`/`00dc` frame chunks, built to
    * spec (word-aligned chunks, bottom-up DIB strides padded to 4). */
  private def buildAvi(w: Int, h: Int, framePayloads: Seq[Array[Byte]],
                       compression: Int, chunkId: Int): Array[Byte] = {
    val n = framePayloads.length
    val maxFrame = framePayloads.map(_.length).foldLeft(0)(math.max)
    val avih = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(1000000 / VidFps).putInt(0).putInt(0).putInt(0)
      .putInt(n).putInt(0).putInt(1).putInt(maxFrame)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0).array()
    val strh = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(VIDS).putInt(if (compression == 0) 0 else compression)
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(VidFps) // dwScale, dwRate → fps = rate/scale
      .putInt(0).putInt(n).putInt(maxFrame).putInt(0).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort).array()
    val strf = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(compression).putInt(((w * 3 + 3) / 4 * 4) * h)
      .putInt(0).putInt(0).putInt(0).putInt(0).array()
    val hdrl = list(HDRL, chunk(cc("avih"), avih) ++
      list(STRL, chunk(STRH, strh) ++ chunk(STRF, strf)))
    val movi = list(MOVI, framePayloads.flatMap(p => chunk(chunkId, p)).toArray)
    riff(hdrl ++ movi)
  }

  private def dibPayload(id: Long, f: Int, w: Int, h: Int): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val row = (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        out(row + x * 3) = vpxB(id, f, x, y).toByte
        out(row + x * 3 + 1) = vpxG(id, f, x, y).toByte
        out(row + x * 3 + 2) = vpxR(id, f, x, y).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Render one raw-DIB AVI per row: `(key, media, media_type)`.
    * Fixture generator for the video decode gate. */
  def renderAvis(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(keyCol).cast(LongType).as("__k"))
    val outSchema = StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField("media", BinaryType, nullable = false),
      StructField("media_type", StringType, nullable = false)))
    val rows = in.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = (vidW(id), vidH(id))
        val frames = (0 until vidFrames(id)).map(f => dibPayload(id, f, w, h))
        Row(id, buildAvi(w, h, frames, 0, DB00), "video/x-msvideo")
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** MJPEG twin of [[renderAvis]] — every frame ImageIO-JPEG-encoded
    * into `00dc` chunks. Lossy, so spec-gated, not SQL-gated. */
  def renderMjpegAvis(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(keyCol).cast(LongType).as("__k"))
    val outSchema = StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField("media", BinaryType, nullable = false),
      StructField("media_type", StringType, nullable = false)))
    val rows = in.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = (vidW(id), vidH(id))
        val frames = (0 until vidFrames(id)).map { f =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, (vpxR(id, f, x, y) << 16) |
                (vpxG(id, f, x, y) << 8) | vpxB(id, f, x, y))
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          noDiskCache()
          ImageIO.write(img, "jpg", bos)
          bos.toByteArray
        }
        Row(id, buildAvi(w, h, frames, MJPG, DC00), "video/x-msvideo")
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Test fixture for the stream-indexing contract: an audio+video AVI
    * with the AUDIO stream declared first (a common mux order), so the
    * video frames live in `01db` chunks and headers must be taken from
    * stream 1, not stream 0. Parsing this proves [[parseAvi]] keys on
    * the video stream's hdrl index rather than assuming stream 0
    * (MediaCodecsSpec). */
  private[graft] def buildTestAviAudioFirst(id: Long): Array[Byte] = {
    val (w, h) = (vidW(id), vidH(id))
    val frames = (0 until vidFrames(id)).map(f => dibPayload(id, f, w, h))
    val avih = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(1000000 / VidFps).putInt(0).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(2).putInt(0)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0).array()
    // minimal PCM 'auds' stream header (no data chunks needed)
    val strhA = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(cc("auds")).putInt(0).putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(8000).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      .putShort(0).putShort(0).putShort(0).putShort(0).array()
    val strfA = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16).array()
    val strhV = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(VIDS).putInt(0).putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(VidFps).putInt(0).putInt(frames.length).putInt(0)
      .putInt(0).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort).array()
    val strfV = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(((w * 3 + 3) / 4 * 4) * h)
      .putInt(0).putInt(0).putInt(0).putInt(0).array()
    val hdrl = list(HDRL, chunk(cc("avih"), avih) ++
      list(STRL, chunk(STRH, strhA) ++ chunk(STRF, strfA)) ++
      list(STRL, chunk(STRH, strhV) ++ chunk(STRF, strfV)))
    val movi = list(MOVI,
      frames.flatMap(p => chunk(cc("01db"), p)).toArray)
    riff(hdrl ++ movi)
  }

  /** Parsed AVI STRUCTURE: geometry/timing from the video stream's
    * headers plus the byte range of each of its frame chunks. Frames
    * are NOT decoded here — metadata consumers never pay pixel cost,
    * and the sampler decodes only the frames it emits (a multi-GB
    * production AVI must never materialize all its pixels per row). */
  private case class AviVideo(width: Int, height: Int, scale: Int, rate: Int,
                              compression: Int, bytes: Array[Byte],
                              frameChunks: Vector[(Int, Int)]) {
    def nFrames: Int = frameChunks.length
    /** Decode one frame to top-down row-major RGB (throws on bad data). */
    def frame(i: Int): Array[Int] = {
      val (off, len) = frameChunks(i)
      decodeFrame(bytes, off, len, width, height, compression)
    }
  }

  /** The real container walk: RIFF envelope → hdrl (strh timing, strf
    * BITMAPINFOHEADER) → movi frame-chunk offsets. Streams are indexed
    * in hdrl declaration order, and frame chunks are matched by the
    * VIDEO stream's index (`NNdb`/`NNdc`), so audio+video muxes with
    * the audio stream declared first parse correctly; headers latch on
    * the FIRST `vids` stream only. Any structural failure → None
    * (decode_ok = false downstream). */
  private def parseAvi(bytes: Array[Byte]): Option[AviVideo] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (bb.remaining() < 12 || bb.getInt() != RIFF) return None
      bb.getInt() // riff size
      if (bb.getInt() != AVI) return None
      var width, height, scale, rate, compression = 0
      var streamIdx = -1 // increments per strh, in hdrl order
      var vidStream = -1 // the FIRST vids stream's index
      var lastStrhWasVids = false
      val chunks = Vector.newBuilder[(Int, Int)]
      def vidChunkId(id: Int): Boolean = {
        // 'NNdb' / 'NNdc' with NN the video stream's decimal index
        if (vidStream < 0) return false
        val d0 = (id & 0xFF) - '0'; val d1 = ((id >> 8) & 0xFF) - '0'
        val tail = id >>> 16
        d0 >= 0 && d0 <= 9 && d1 >= 0 && d1 <= 9 && d0 * 10 + d1 == vidStream &&
          (tail == (DB00 >>> 16) || tail == (DC00 >>> 16))
      }
      def walk(end: Int, inStrl: Boolean, inMovi: Boolean): Unit = {
        while (bb.position() + 8 <= end) {
          val id = bb.getInt(); val sz = bb.getInt()
          val next = bb.position() + sz + (sz % 2)
          if (next > end || sz < 0) throw new IllegalArgumentException("chunk overruns")
          if (id == LIST) {
            val lt = bb.getInt()
            walk(bb.position() + sz - 4,
              inStrl || lt == STRL, inMovi || lt == MOVI)
          } else if (inStrl && id == STRH && sz >= 36) {
            streamIdx += 1
            val fccType = bb.getInt()
            lastStrhWasVids = fccType == VIDS && vidStream < 0
            if (lastStrhWasVids) {
              vidStream = streamIdx
              bb.getInt(); bb.getInt(); bb.getShort(); bb.getShort(); bb.getInt()
              scale = bb.getInt(); rate = bb.getInt()
            }
          } else if (inStrl && lastStrhWasVids && id == STRF && sz >= 40 && width == 0) {
            bb.getInt() // biSize
            width = bb.getInt(); height = bb.getInt()
            bb.getShort(); val bits = bb.getShort()
            compression = bb.getInt()
            if (compression == 0 && bits != 24)
              throw new IllegalArgumentException(s"unsupported DIB depth $bits")
          } else if (inMovi && vidChunkId(id)) {
            chunks += ((bb.position(), sz))
          }
          bb.position(next)
        }
      }
      walk(bytes.length, inStrl = false, inMovi = false)
      val fr = chunks.result()
      if (vidStream < 0 || width <= 0 || height <= 0 || fr.isEmpty) None
      else Some(AviVideo(width, height, scale, rate, compression, bytes, fr))
    } catch { case _: Exception => None }

  private def decodeFrame(bytes: Array[Byte], off: Int, len: Int,
                          w: Int, h: Int, compression: Int): Array[Int] =
    if (compression == MJPG) {
      noDiskCache()
      val img = ImageIO.read(new ByteArrayInputStream(bytes, off, len))
      require(img != null && img.getWidth == w && img.getHeight == h, "bad MJPG frame")
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = img.getRGB(x, y) & 0xFFFFFF; x += 1 }
        y += 1
      }
      out
    } else if (compression == 0) {
      val stride = (w * 3 + 3) / 4 * 4
      require(len >= stride * h, "short DIB frame")
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val row = off + (h - 1 - y) * stride // bottom-up
        var x = 0
        while (x < w) {
          out(y * w + x) = ((bytes(row + x * 3 + 2) & 0xFF) << 16) |
            ((bytes(row + x * 3 + 1) & 0xFF) << 8) | (bytes(row + x * 3) & 0xFF)
          x += 1
        }
        y += 1
      }
      out
    } else throw new IllegalArgumentException(
      f"unsupported biCompression 0x$compression%08x")

  /** Container + stream metadata through the real parser:
    * `(key, decode_ok, width, height, n_frames, fps)`. `decode_ok`
    * here means the CONTAINER parsed (structure, headers, chunk walk)
    * — no pixel decode is paid; per-frame codec failures surface in
    * [[sampleVideoFrames]], which does decode. */
  def decodeVideoMetadata(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(keyCol), col("media"))
    val outSchema = StructType(Seq(
      in.schema.fields(0),
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("fps", DoubleType, nullable = true)))
    val rows = in.rdd.mapPartitions { it =>
      it.map { r =>
        parseAvi(r.getAs[Array[Byte]]("media")) match {
          case Some(v) if v.scale > 0 =>
            Row(r.get(0), true, v.width.toLong, v.height.toLong,
              v.nFrames.toLong, v.rate.toDouble / v.scale)
          case _ => Row(r.get(0), false, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Frame sampling through the real decoder — the training-pipeline
    * shape (decode once per video, emit every `everyNth` frame):
    * `(key, frame_idx, width, height, mean_gray)` with the same
    * exact-integer luminance as the image path, so the raw-DIB fixture
    * is analytically SQL-checkable per frame. Undecodable videos emit
    * a single `frame_idx = -1` row (decode_ok = false), keeping the
    * failure visible in the exploded output. */
  def sampleVideoFrames(df: DataFrame, keyCol: String, everyNth: Int = 2): DataFrame = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    val spark = df.sparkSession
    val in = df.select(col(keyCol), col("media"))
    val outSchema = StructType(Seq(
      in.schema.fields(0),
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("mean_gray", DoubleType, nullable = true)))
    val rows = in.rdd.mapPartitions { it =>
      it.flatMap { r =>
        // only the SAMPLED frames decode (skipped frames stay raw
        // chunk offsets); a codec failure on any sampled frame flags
        // the whole video rather than failing the task
        val sampled =
          parseAvi(r.getAs[Array[Byte]]("media")).flatMap { v =>
            try Some((0 until v.nFrames by everyNth).map { f =>
              val px = v.frame(f)
              var sum = 0L
              var i = 0
              while (i < px.length) { sum += gray(px(i)); i += 1 }
              (f, v.width, v.height, sum.toDouble / px.length)
            })
            catch { case _: Exception => None }
          }
        sampled match {
          case Some(frames) => frames.iterator.map { case (f, w, h, mg) =>
            Row(r.get(0), true, f.toLong, w.toLong, h.toLong, mg)
          }
          case None => Iterator.single(Row(r.get(0), false, -1L, null, null, null))
        }
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
