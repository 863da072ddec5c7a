package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star scope): image/audio/video as
  * opaque `binary` columns + typed metadata struct, with decode /
  * feature-extract / resize / frame-sample as per-partition batch
  * transforms.
  *
  * The Spark-side plumbing — schema, partition-iterator batching,
  * Dataset[T] signatures — is real and tested. Decode is tiered by what
  * the payload actually is: real PNG/JPEG bytes (detected by magic, the
  * ground truth — never the format tag) go through `javax.imageio`, a
  * true JDK-native pixel decode; everything else (audio/video, and
  * payloads that aren't decodable images) falls back to a deterministic
  * byte-level stub, so a real audio/video codec swap changes one function
  * body and nothing else.
  *
  * Scale notes: media rows are large, so the transforms use
  * `mapPartitions` (one setup per partition, the place a real decoder
  * would lazily init its native context), never per-row UDF setup. Binary
  * payloads stay columnar-compressed in parquet; metadata predicates
  * (format, width) push down without touching payload bytes.
  */
object MultimodalOps {

  case class MediaRow(doc_id: Long, media: Array[Byte], format: String,
                      width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                           features: Array[Double])
  case class FrameSample(doc_id: Long, frame_idx: Int, frame_bytes: Long)

  /** Build a media table from any (id, text) frame: the text bytes play
    * the raw media payload; metadata derives deterministically. In a real
    * ingest this is the parquet schema media files land in.
    */
  def toMediaTable(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      concat(lit("fake/"),
             element_at(split(lit("png,jpeg,wav,mp4"), ","),
                        (pmod(col(idCol), lit(4)) + 1).cast("int")))
        .as("format"),
      (pmod(col(idCol), lit(64)) * 16 + 64).cast("int").as("width"),
      (pmod(col(idCol), lit(32)) * 16 + 64).cast("int").as("height"))

  /** STUB decoder for non-image payloads: 8 stride-averaged byte buckets
    * in [0,1]. Bucket b = sum of bytes at positions ≡ b (mod dim), as an
    * EXACT integer, then one double division chain (sum/count/255) — the
    * integer sum makes the value bit-reproducible in any engine that
    * evaluates the same divisions, which is what lets the DuckDB oracle
    * check f0 through the mapPartitions path.
    */
  private[multimodal] def decodeStub(bytes: Array[Byte],
                                     dim: Int = 8): Array[Double] = {
    val out = new Array[Double](dim)
    if (bytes.isEmpty) return out
    val sums = new Array[Long](dim)
    val counts = new Array[Int](dim)
    var i = 0
    while (i < bytes.length) {
      val b = i % dim
      sums(b) += (bytes(i) & 0xff)
      counts(b) += 1
      i += 1
    }
    var j = 0
    while (j < dim) {
      if (counts(j) > 0) out(j) = sums(j).toDouble / counts(j) / 255.0
      j += 1
    }
    out
  }

  private val PngMagic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)
  private val JpegMagic = Array(0xff, 0xd8, 0xff).map(_.toByte)

  private def hasMagic(bytes: Array[Byte], magic: Array[Byte]): Boolean =
    bytes.length >= magic.length &&
      magic.indices.forall(i => bytes(i) == magic(i))

  /** Real image decode via `javax.imageio` (JDK-native, no external
    * libs): pixels → 8 stride-bucketed mean luminances in [0,1]
    * (bucket b = pixels at raster positions ≡ b (mod dim); luminance =
    * (r+g+b)/(3·255), integer sums). Returns None when the payload isn't
    * a decodable PNG/JPEG — magic-sniffed first so non-image bytes never
    * pay a decoder attempt.
    */
  private[multimodal] def decodeImage(bytes: Array[Byte],
                                      dim: Int = 8): Option[Array[Double]] = {
    if (!hasMagic(bytes, PngMagic) && !hasMagic(bytes, JpegMagic)) None
    else try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
        val sums = new Array[Long](dim)
        val counts = new Array[Int](dim)
        val w = img.getWidth
        var p = 0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sums(p % dim) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)
            counts(p % dim) += 1
            p += 1
            x += 1
          }
          y += 1
        }
        val out = new Array[Double](dim)
        var j = 0
        while (j < dim) {
          if (counts(j) > 0) out(j) = sums(j).toDouble / counts(j) / 765.0
          j += 1
        }
        out
      }
    } catch { case _: Exception => None } // truncated/corrupt image → stub
  }

  private def isWav(bytes: Array[Byte]): Boolean =
    bytes.length > 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E'

  /** Real audio decode via `javax.sound.sampled` (JDK-native): 16-bit
    * PCM WAV → dim stride-bucketed mean absolute amplitudes in [0,1]
    * (bucket b = samples at indices ≡ b (mod dim), across channels;
    * integer |sample| sums / count / 32768). None for non-WAV bytes or
    * encodings the JDK can't hand back as 16-bit signed PCM — those fall
    * to the stub, same contract as the image tier.
    */
  private[multimodal] def decodeAudio(bytes: Array[Byte],
                                      dim: Int = 8): Option[Array[Double]] = {
    if (!isWav(bytes)) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val data = in.readAllBytes()
          val n = data.length / 2
          if (n == 0) return Some(new Array[Double](dim))
          val sums = new Array[Long](dim)
          val counts = new Array[Int](dim)
          val big = fmt.isBigEndian
          var i = 0
          while (i < n) {
            val lo = data(2 * i + (if (big) 1 else 0)) & 0xff
            val hi = data(2 * i + (if (big) 0 else 1)).toInt
            val s = (hi << 8) | lo
            sums(i % dim) += math.abs(s).toLong
            counts(i % dim) += 1
            i += 1
          }
          val out = new Array[Double](dim)
          var j = 0
          while (j < dim) {
            if (counts(j) > 0) out(j) = sums(j).toDouble / counts(j) / 32768.0
            j += 1
          }
          Some(out)
        }
      } finally in.close()
    } catch { case _: Exception => None } // truncated/corrupt wav → stub
  }

  /** Payload → feature vector, tiered by what the bytes ARE: imageio for
    * real images, javax.sound for real 16-bit PCM WAV, byte-level stub
    * for everything else (video has no JDK codec — documented stub).
    */
  private[multimodal] def decode(bytes: Array[Byte],
                                 dim: Int = 8): Array[Double] =
    decodeImage(bytes, dim)
      .orElse(decodeAudio(bytes, dim))
      .getOrElse(decodeStub(bytes, dim))

  /** Feature extraction over the media table: per-partition batch decode.
    * This is where a 1000-executor cluster spends its time, so the shape
    * matters: iterator-in/iterator-out, no per-row init, no collect.
    */
  def extractFeatures(spark: SparkSession,
                      media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder setup: keep imageio off its disk cache
      // (scratch-file-per-image otherwise; everything here is in-memory)
      ImageIO.setUseCache(false)
      rows.map { r =>
        // a null payload (toMediaTable over a null-text doc) is an
        // EMPTY payload, not a task-killing NPE: n_bytes 0, stub zeros
        val bytes = if (r.media == null) Array.emptyByteArray else r.media
        MediaFeatures(r.doc_id, r.format, bytes.length.toLong,
                      decode(bytes))
      }
    }
  }

  /** STUB resize: a real impl rescales pixels; the fake truncates the
    * payload proportionally — preserves the metadata/plumbing contract.
    */
  def resize(spark: SparkSession, media: DataFrame, newWidth: Int,
             newHeight: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.media == null) Array.emptyByteArray else r.media
        val scale = math.min(1.0,
          (newWidth.toDouble * newHeight) /
            math.max(1, r.width.toDouble * r.height))
        val n = math.max(1, (bytes.length * scale).toInt)
        MediaRow(r.doc_id, bytes.take(n), r.format, newWidth, newHeight)
      }
    }
  }

  /** STUB frame sampler: every `stride`-th 1 KiB block plays a video
    * frame. Demonstrates the one-to-many (explode) media transform shape.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   stride: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.media == null) Array.emptyByteArray else r.media
        val frames = bytes.grouped(1024).zipWithIndex
        frames.collect { case (f, idx) if idx % stride == 0 =>
          FrameSample(r.doc_id, idx, f.length.toLong)
        }
      }
    }
  }
}
