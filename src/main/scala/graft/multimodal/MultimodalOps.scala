package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star scope): image/audio/video as
  * opaque `binary` columns + typed metadata struct, with decode /
  * feature-extract / resize / frame-sample as per-partition batch
  * transforms.
  *
  * The Spark-side plumbing — schema, partition-iterator batching,
  * Dataset[T] signatures — is real and tested. The codec itself is STUBBED
  * with a deterministic fake (this container has no image/audio libs): the
  * stub reads the bytes it would hand to a decoder and emits fixed-shape
  * features, so swapping in a real JNI/javacpp decoder changes one
  * function body and nothing else.
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
                           features: Array[Float])
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

  /** STUB decoder: a real implementation would hand `bytes` to an image
    * codec. The fake is deterministic: 8 stride-averaged byte buckets,
    * normalized — stable across runs and partitionings.
    */
  private[multimodal] def decodeStub(bytes: Array[Byte],
                                     dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes.isEmpty) return out
    val counts = new Array[Int](dim)
    var i = 0
    while (i < bytes.length) {
      val b = i % dim
      out(b) += (bytes(i) & 0xff) / 255.0f
      counts(b) += 1
      i += 1
    }
    var j = 0
    while (j < dim) { if (counts(j) > 0) out(j) /= counts(j); j += 1 }
    out
  }

  /** Feature extraction over the media table: per-partition batch decode.
    * This is where a 1000-executor cluster spends its time, so the shape
    * matters: iterator-in/iterator-out, no per-row init, no collect.
    */
  def extractFeatures(spark: SparkSession,
                      media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real decoder context would be initialized here, once per partition
      rows.map { r =>
        MediaFeatures(r.doc_id, r.format, r.media.length.toLong,
                      decodeStub(r.media))
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
        val scale = math.min(1.0,
          (newWidth.toDouble * newHeight) /
            math.max(1, r.width.toDouble * r.height))
        val n = math.max(1, (r.media.length * scale).toInt)
        MediaRow(r.doc_id, r.media.take(n), r.format, newWidth, newHeight)
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
        val frames = r.media.grouped(1024).zipWithIndex
        frames.collect { case (f, idx) if idx % stride == 0 =>
          FrameSample(r.doc_id, idx, f.length.toLong)
        }
      }
    }
  }
}
