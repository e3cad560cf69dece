package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** Perceptual dHash behavior on synthetic in-memory PNGs: stable
  * under resize and mild brightness shift (the near-dup cases),
  * far from an unrelated image, None on torn bytes.
  */
class MultimodalHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // a diagonal gradient — rich horizontal structure for dHash
  private def gradient(scale: Int, brighten: Int = 0) =
    png(36 * scale, 32 * scale) { (x, y) =>
      val v = ((x / scale * 5 + y / scale * 3) % 256 + brighten)
        .max(0).min(255)
      (v << 16) | (v << 8) | v
    }

  test("identical images collide; resize and brightness stay near") {
    val base = Multimodal.dHash(gradient(1)).get
    val same = Multimodal.dHash(gradient(1)).get
    assert(base == same)
    val doubled = Multimodal.dHash(gradient(2)).get
    assert(Multimodal.hamming(base, doubled) <= 6,
      s"resize moved ${Multimodal.hamming(base, doubled)} bits")
    val brighter = Multimodal.dHash(gradient(1, brighten = 12)).get
    assert(Multimodal.hamming(base, brighter) <= 6,
      s"brightness moved ${Multimodal.hamming(base, brighter)} bits")
  }

  test("an unrelated image is far away") {
    val base = Multimodal.dHash(gradient(1)).get
    // deterministic hash-noise image — no shared gradient structure
    val noise = png(36, 32) { (x, y) =>
      val v = (x * 2654435761L + y * 40503L).toInt & 0xff
      (v << 16) | (v << 8) | v
    }
    val other = Multimodal.dHash(noise).get
    assert(Multimodal.hamming(base, other) >= 16,
      s"only ${Multimodal.hamming(base, other)} bits apart")
  }

  test("SyntheticImages: deterministic, twins near, noise far (the q253 contract)") {
    import Multimodal.SyntheticImages._
    val seed = 42L
    assert(java.util.Arrays.equals(gradientPng(seed, 1, 0), gradientPng(seed, 1, 0)))
    val base = Multimodal.dHash(gradientPng(seed, 1, 0)).get
    val bright = Multimodal.dHash(gradientPng(seed, 1, 10)).get
    val resized = Multimodal.dHash(gradientPng(seed, 2, 0)).get
    val noise = Multimodal.dHash(noisePng(seed)).get
    assert(Multimodal.hamming(base, bright) <= 3)
    assert(Multimodal.hamming(base, resized) <= 6)
    assert(Multimodal.hamming(base, noise) >= 10)
    // strided seeds (the q253 selection is every 7th doc) must not
    // collapse into one pattern class
    val classes = (0 until 70 by 7)
      .map(i => Multimodal.dHash(gradientPng(i.toLong, 1, 0)).get).distinct
    assert(classes.size >= 8, s"only ${classes.size} distinct patterns")
  }

  test("torn payloads hash to None; imageHashes keeps them as null rows") {
    import spark.implicits._
    assert(Multimodal.dHash(Array[Byte](1, 2, 3)).isEmpty)
    val whole = gradient(1)
    val torn = whole.take(whole.length / 3)
    assert(Multimodal.dHash(torn).isEmpty)
    val media = Seq(
      Multimodal.MediaRecord(1L, whole, "png", whole.length),
      Multimodal.MediaRecord(2L, torn, "png", torn.length))
      .toDS()
    val out = Multimodal.imageHashes(media).collect().sortBy(_.media_id)
    assert(out(0).dhash.isDefined && out(1).dhash.isEmpty)
  }
}
