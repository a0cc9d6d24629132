package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The Spark-side mechanics — schema, partition-sized batches, frame
  * explosion — are real and tested. REAL decoders exist in
  * [[MediaCodecs]] for all three modalities: images (JDK ImageIO —
  * decode, histogram, NN resize), audio (AudioSystem — WAV stats),
  * and, since round 8, video (AVI RIFF container walk with raw-DIB and
  * MJPEG frame decode — metadata + frame sampling, SQL-value-gated on
  * the lossless DIB path). This file keeps the codec-agnostic plumbing
  * and the deterministic fake as the seam for codecs BEYOND the JDK's
  * reach (H.264/VP9/…): `FakeCodec.decode` is where a javacv /
  * Pandas-UDF-sidecar decoder slots in without touching the plumbing.
  */
object Multimodal {

  /** Derive a binary media column from text (test stand-in for real
    * media bytes: utf-8 payload + a deterministic media_type tag). */
  def attachFakeBinary(df: DataFrame, keyCol: String, textCol: String): DataFrame =
    // NULL text → zero-byte payload, not NULL media: a NULL media cell
    // would NPE the digest update inside every mapPartitions consumer
    // (the module contract is that decode paths never fail a job)
    df.select(col(keyCol),
      encode(coalesce(col(textCol), lit("")), "UTF-8").as("media"),
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col(keyCol), lit(3)) + 1).cast(IntegerType)).as("media_type"))

  /** Typed metadata extraction — pure expressions (codegen'd): byte
    * length, content hash, and fake decoded dimensions derived
    * deterministically from the payload size. */
  def extractMetadata(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol),
      col("media_type"),
      length(col("media")).as("byte_len"),
      sha2(col("media"), 256).as("sha256"),
      (pmod(length(col("media")), lit(640)) + lit(16)).cast(LongType).as("width"),
      (pmod(floor(length(col("media")) / 7), lit(480)) + lit(16)).cast(LongType).as("height"),
      (pmod(length(col("media")), lit(30)) + lit(1)).cast(LongType).as("n_frames"))

  /** The codec seam: the ONE interface a real deployment implements to
    * replace the stub — everything else (schema, batch shape, frame
    * explosion) is codec-agnostic. Must be Serializable: instances
    * ship inside the mapPartitions closure and are reused across a
    * partition's rows (amortizing real-decoder init).
    * MultimodalCodecContractSpec pins that ANY implementation slots in
    * without schema change. */
  trait MediaCodec extends Serializable {
    /** One frame's decoded payload (pixels/samples in a real impl). */
    def decode(media: Array[Byte], frameIdx: Long): Array[Byte]
  }

  /** STUB codec boundary for formats beyond the JDK (AVI raw-DIB and
    * MJPEG have a real decoder — [[MediaCodecs.sampleVideoFrames]]).
    * A real deployment decodes pixels/samples here; the fake returns a
    * deterministic per-frame digest so the pipeline shape (binary →
    * per-frame rows) is testable. */
  object FakeCodec extends MediaCodec {
    def decode(media: Array[Byte], frameIdx: Long): Array[Byte] = {
      // ??? ← H.264/VP9-class decoder goes here (e.g. javacv FFmpegFrameGrabber);
      // deterministic fake: frame digest = sha-256(media ++ ":" ++ idx).
      // The suffix is ASCII decimal (not raw bytes) so the whole digest
      // input stays valid UTF-8 — SQL-mirrorable for the oracle gate.
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.update(media)
      md.update(s":$frameIdx".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.digest()
    }
  }

  /** STUB resize: a real implementation decodes, resamples, and
    * re-encodes; the fake re-digests the payload with the target
    * geometry so outputs are deterministic and distinct per target.
    * Batch-shaped like [[sampleFrames]] — one codec per partition. */
  def resize(df: DataFrame, keyCol: String, targetW: Int, targetH: Int): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(keyCol), col("media"), col("media_type"))
    val outSchema = StructType(Seq(
      in.schema.fields(0), in.schema.fields(2),
      StructField("media", BinaryType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false)))
    val outRows = in.rdd.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        md.reset()
        // defensive for direct callers: a NULL media cell digests as
        // the zero-byte payload instead of NPE-ing the task
        val media = r.getAs[Array[Byte]]("media")
        md.update(if (media == null) Array.emptyByteArray else media)
        md.update(s":resize:$targetW:$targetH".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        Row(r.get(0), r.get(2), md.digest(), targetW.toLong, targetH.toLong)
      }
    }
    spark.createDataFrame(outRows, outSchema)
  }

  /** Feature extraction: media → 8 deterministic doubles in [0,1),
    * derived from sha-256(media ++ ":feat") 8 hex chars at a time.
    * The mapPartitions shape is the real pattern — load the embedding
    * model once per partition, stream rows through it — and the fake
    * formula is SQL-mirrorable, so this one IS value-checked by the
    * DuckDB oracle (unusual for a stub: the batch plumbing, schema,
    * and determinism all sit in the gated path). */
  def extractFeatures(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(keyCol), col("media"))
    val outSchema = StructType(
      in.schema.fields(0) +: (0 until 8).map(i =>
        StructField(s"f$i", DoubleType, nullable = false)))
    val outRows = in.rdd.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256") // "model" init, once per batch
      it.map { r =>
        md.reset()
        // defensive for direct callers: a NULL media cell digests as
        // the zero-byte payload instead of NPE-ing the task
        val media = r.getAs[Array[Byte]]("media")
        md.update(if (media == null) Array.emptyByteArray else media)
        md.update(":feat".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hex = md.digest().map("%02x".format(_)).mkString
        val feats = (0 until 8).map(i =>
          java.lang.Long.parseLong(hex.substring(i * 8, i * 8 + 8), 16) / 4294967296.0)
        Row.fromSeq(r.get(0) +: feats)
      }
    }
    spark.createDataFrame(outRows, outSchema)
  }

  /** Frame sampling: one output row per sampled frame, batch-processed
    * with mapPartitions (the Scala analogue of mapInPandas batches —
    * per-partition codec reuse, streaming iterator, no whole-partition
    * materialization). */
  def sampleFrames(df: DataFrame, keyCol: String, everyNth: Int = 10,
                   codec: MediaCodec = FakeCodec): DataFrame = {
    // fail at plan time, not per-row inside tasks ('step cannot be 0'):
    // the module's contract is that decode paths never fail a job
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    val spark = df.sparkSession
    val withMeta = df.select(col(keyCol), col("media"),
      (pmod(length(col("media")), lit(30)) + lit(1)).cast(LongType).as("n_frames"))
    val keyIdx = 0
    val outSchema = StructType(Seq(
      withMeta.schema.fields(keyIdx),
      StructField("frame_idx", LongType, nullable = false),
      StructField("frame_digest", StringType, nullable = false)))
    val outRows = withMeta.rdd.mapPartitions { it =>
      // one codec instance per partition (the expensive init a real
      // decoder would amortize across the batch)
      it.flatMap { r =>
        // same defensive convention: NULL media decodes as zero bytes
        val raw = r.getAs[Array[Byte]]("media")
        val media = if (raw == null) Array.emptyByteArray else raw
        val n = r.getAs[Long]("n_frames")
        (0L until n by everyNth.toLong).iterator.map { f =>
          val digest = codec.decode(media, f)
          Row(r.get(keyIdx), f, digest.map("%02x".format(_)).mkString)
        }
      }
    }
    spark.createDataFrame(outRows, outSchema)
  }
}
