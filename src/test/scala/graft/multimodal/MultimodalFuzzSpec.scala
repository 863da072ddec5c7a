package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream,
  AudioSystem}

import scala.util.Random

import graft.SparkSpec

/** Randomized decode-parameter grids for the multimodal tier (r10
  * verdict task 4b): `MultimodalDecodeSpec` pins ONE 16×8 PNG, ONE
  * 16 kHz mono WAV, and dim=8 everywhere; the decode contract claims
  * totality and exact bucket math over arbitrary dims, geometries,
  * channel counts, sample rates, and hostile (truncated) payloads.
  *
  * Every assertion recomputes the expected features INDEPENDENTLY from
  * the same source pixels/samples/bytes (never by calling the code
  * under test twice with different shapes). Oracle-inexpressible
  * (DuckDB has no image/audio codec), so this is the engine-side
  * self-check family `mm_decode_grid` in the PLANS certification map.
  */
class MultimodalFuzzSpec extends SparkSpec {

  private def randImage(r: Random): BufferedImage = {
    val (w, h) = (1 + r.nextInt(24), 1 + r.nextInt(12))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, r.nextInt(1 << 24))
    img
  }

  private def toPng(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Independent raster-order luminance buckets at arbitrary dim. */
  private def imageFeatures(img: BufferedImage, dim: Int): Seq[Double] = {
    val sums = new Array[Long](dim)
    val counts = new Array[Int](dim)
    var p = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      sums(p % dim) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      counts(p % dim) += 1
      p += 1
    }
    (0 until dim).map(j =>
      if (counts(j) > 0) sums(j).toDouble / counts(j) / 765.0 else 0.0)
  }

  private def toWav(samples: Array[Short], rate: Float,
                    channels: Int): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, channels, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt,
                           samples.length / channels),
      AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Independent interleaved-value amplitude buckets at arbitrary dim. */
  private def audioFeatures(samples: Array[Short], dim: Int): Seq[Double] = {
    val sums = new Array[Long](dim)
    val counts = new Array[Int](dim)
    samples.zipWithIndex.foreach { case (s, i) =>
      sums(i % dim) += math.abs(s.toInt); counts(i % dim) += 1
    }
    (0 until dim).map(j =>
      if (counts(j) > 0) sums(j).toDouble / counts(j) / 32768.0 else 0.0)
  }

  private def stubFeatures(bytes: Array[Byte], dim: Int): Seq[Double] = {
    val sums = new Array[Long](dim)
    val counts = new Array[Int](dim)
    bytes.zipWithIndex.foreach { case (b, i) =>
      sums(i % dim) += (b & 0xff); counts(i % dim) += 1
    }
    (0 until dim).map(j =>
      if (counts(j) > 0) sums(j).toDouble / counts(j) / 255.0 else 0.0)
  }

  test("image decode matches independent pixel math over random geometry × dim") {
    for (seed <- 1L to 12L) {
      val r = new Random(seed)
      val img = randImage(r)
      val dim = 1 + r.nextInt(12)
      val png = toPng(img)
      val got = MultimodalOps.decodeImage(png, dim)
      assert(got.isDefined, s"seed=$seed ${img.getWidth}x${img.getHeight}")
      assert(got.get.toSeq === imageFeatures(img, dim),
        s"seed=$seed ${img.getWidth}x${img.getHeight} dim=$dim")
    }
  }

  test("audio decode matches independent sample math over rate × channels × dim") {
    val rates = Seq(8000f, 11025f, 16000f, 22050f, 44100f)
    for (seed <- 21L to 32L) {
      val r = new Random(seed)
      val channels = 1 + r.nextInt(2)
      // whole frames only: total values must be a channel multiple
      val frames = r.nextInt(300)
      val samples = Array.fill(frames * channels)(
        (r.nextInt(65536) - 32768).toShort)
      val dim = 1 + r.nextInt(12)
      val wav = toWav(samples, rates(r.nextInt(rates.size)), channels)
      val got = MultimodalOps.decodeAudio(wav, dim)
      assert(got.isDefined, s"seed=$seed ch=$channels n=${samples.length}")
      assert(got.get.toSeq === audioFeatures(samples, dim),
        s"seed=$seed ch=$channels n=${samples.length} dim=$dim")
    }
  }

  test("random truncation is total: stub fallback, right dim, values in [0,1]") {
    for (seed <- 41L to 52L) {
      val r = new Random(seed)
      val full =
        if (r.nextBoolean()) toPng(randImage(r))
        else toWav(Array.fill(64)((r.nextInt(65536) - 32768).toShort),
                   16000f, 1)
      val cut = full.take(r.nextInt(full.length)) // 0 ≤ len < full
      val dim = 1 + r.nextInt(12)
      // totality: no payload length may throw
      val got = MultimodalOps.decode(cut, dim)
      assert(got.length === dim, s"seed=$seed len=${cut.length}")
      assert(got.forall(v => v >= 0.0 && v <= 1.0), s"seed=$seed")
      // when neither codec accepts the torso, the value IS the stub's
      // exact integer chain (recomputed independently here)
      if (MultimodalOps.decodeImage(cut, dim).isEmpty &&
          MultimodalOps.decodeAudio(cut, dim).isEmpty)
        assert(got.toSeq === stubFeatures(cut, dim), s"seed=$seed")
    }
  }

  test("stub math holds over random payloads × dim, including empty") {
    for (seed <- 61L to 72L) {
      val r = new Random(seed)
      val bytes = Array.fill(r.nextInt(200))(r.nextInt(256).toByte)
      val dim = 1 + r.nextInt(16)
      assert(MultimodalOps.decodeStub(bytes, dim).toSeq ===
        stubFeatures(bytes, dim), s"seed=$seed n=${bytes.length} dim=$dim")
    }
    assert(MultimodalOps.decodeStub(Array.emptyByteArray, 5).toSeq ===
      Seq.fill(5)(0.0))
  }

  test("a random mixed batch flows through extractFeatures per-row-exact") {
    import spark.implicits._
    val r = new Random(99L)
    val rows = (1L to 10L).map { id =>
      val payload = r.nextInt(3) match {
        case 0 => toPng(randImage(r))
        case 1 => toWav(Array.fill(32 + r.nextInt(64))(
                    (r.nextInt(65536) - 32768).toShort), 16000f, 1)
        case _ => Array.fill(r.nextInt(100))(r.nextInt(256).toByte)
      }
      MultimodalOps.MediaRow(id, payload, s"fake/${id % 4}", 16, 8)
    }
    val got = MultimodalOps.extractFeatures(spark, rows.toDF())
      .collect().map(f => f.doc_id -> f).toMap
    rows.foreach { in =>
      val f = got(in.doc_id)
      assert(f.n_bytes === in.media.length.toLong)
      assert(f.features.toSeq === MultimodalOps.decode(in.media).toSeq,
        s"doc ${in.doc_id}")
    }
  }
}
