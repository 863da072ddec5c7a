package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec

/** The tiered decode contract: real PNG/JPEG bytes decode through
  * `javax.imageio` (true pixel features), everything else falls back to
  * the deterministic byte-bucket stub — detected by payload magic, never
  * the format tag.
  */
class MultimodalDecodeSpec extends SparkSpec {

  /** Deterministic 16×8 RGB test image (gradient + channel stripes). */
  private def testImage(): BufferedImage = {
    val img = new BufferedImage(16, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16)
      img.setRGB(x, y, ((x * 16) << 16) | ((y * 32) << 8) | ((x + y) * 10))
    img
  }

  private def toPng(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** The spec's own independent pixel-feature computation. */
  private def expectedFeatures(img: BufferedImage): Array[Double] = {
    val sums = new Array[Long](8)
    val counts = new Array[Int](8)
    var p = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      sums(p % 8) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      counts(p % 8) += 1
      p += 1
    }
    sums.zip(counts).map { case (s, c) => s.toDouble / c / 765.0 }
  }

  test("a real generated PNG decodes to pixel features via imageio") {
    val img = testImage()
    val png = toPng(img)
    val got = MultimodalOps.decodeImage(png)
    assert(got.isDefined, "imageio did not decode a valid PNG")
    assert(got.get.toSeq === expectedFeatures(img).toSeq)
    // and the tiered decode picks the image path, not the byte stub
    assert(MultimodalOps.decode(png).toSeq === got.get.toSeq)
    assert(MultimodalOps.decode(png).toSeq !==
      MultimodalOps.decodeStub(png).toSeq)
  }

  test("the PNG path flows through extractFeatures' mapPartitions batch") {
    import spark.implicits._
    val img = testImage()
    val png = toPng(img)
    val media = Seq(
      MultimodalOps.MediaRow(1L, png, "image/png", 16, 8),
      MultimodalOps.MediaRow(2L, "not an image".getBytes("UTF-8"),
                             "fake/png", 64, 64)).toDF()
    val feats = MultimodalOps.extractFeatures(spark, media)
      .collect().sortBy(_.doc_id)
    assert(feats(0).features.toSeq === expectedFeatures(img).toSeq)
    assert(feats(0).n_bytes === png.length.toLong)
    // the fake/png TAG does not force an image decode: bytes rule
    assert(feats(1).features.toSeq ===
      MultimodalOps.decodeStub("not an image".getBytes("UTF-8")).toSeq)
  }

  test("magic-but-corrupt and non-image payloads fall back to the stub") {
    val corrupt = Array(0x89, 0x50, 0x4e, 0x47, 0x01, 0x02).map(_.toByte)
    assert(MultimodalOps.decodeImage(corrupt).isEmpty)
    assert(MultimodalOps.decode(corrupt).toSeq ===
      MultimodalOps.decodeStub(corrupt).toSeq)
    val text = "plain utf-8 text payload".getBytes("UTF-8")
    assert(MultimodalOps.decodeImage(text).isEmpty)
    assert(MultimodalOps.decode(text).toSeq ===
      MultimodalOps.decodeStub(text).toSeq)
  }

  test("a real generated WAV decodes to PCM amplitude features") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val fmt = new AudioFormat(16000f, 16, 1, true, false) // 16-bit LE mono
    val samples = Array.tabulate[Short](400)(i =>
      (math.sin(i * 0.1) * 12000).toShort)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt,
                           samples.length),
      AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val expected = {
      val sums = new Array[Long](8); val counts = new Array[Int](8)
      samples.zipWithIndex.foreach { case (s, i) =>
        sums(i % 8) += math.abs(s.toInt); counts(i % 8) += 1 }
      sums.zip(counts).map { case (s, c) => s.toDouble / c / 32768.0 }
    }
    val got = MultimodalOps.decodeAudio(wav)
    assert(got.isDefined, "javax.sound did not decode a valid WAV")
    assert(got.get.toSeq === expected.toSeq)
    // tiering: decode() picks the audio path, not the stub
    assert(MultimodalOps.decode(wav).toSeq === expected.toSeq)
    assert(MultimodalOps.decode(wav).toSeq !==
      MultimodalOps.decodeStub(wav).toSeq)
    // RIFF magic but truncated → stub fallback, not a crash
    val corrupt = wav.take(16)
    assert(MultimodalOps.decodeAudio(corrupt).isEmpty)
    assert(MultimodalOps.decode(corrupt).toSeq ===
      MultimodalOps.decodeStub(corrupt).toSeq)
  }

  test("stub bucket values are the exact integer-sum division chain") {
    val bytes = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90)
    val f = MultimodalOps.decodeStub(bytes)
    // bucket 0 sees positions 0 and 8: (10+90)/2/255
    assert(f(0) === 100.0 / 2 / 255.0)
    assert(f(1) === 20.0 / 1 / 255.0)
    assert(MultimodalOps.decodeStub(Array.emptyByteArray).toSeq ===
      Seq.fill(8)(0.0))
  }
}
