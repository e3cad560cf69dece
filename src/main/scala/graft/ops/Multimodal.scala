package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, and batched per-partition feature
  * extraction (the Scala analog of `mapInPandas` batch processing).
  *
  * The actual media decode is STUBBED (no image/audio libraries in
  * this environment): [[stubDecode]] derives a deterministic fake
  * feature vector from the payload bytes. The Spark-side contract —
  * schema, partitioning, batch shape, iterator-to-iterator transform
  * that never materializes a partition — is real and is what matters
  * at 100 TB: media payloads stream through one partition at a time,
  * the decoder is invoked batch-wise, and the output is a normal
  * columnar frame ready for ANN / dedup downstream.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      payload: Array[Byte],
      media_type: String,
      n_bytes: Int)

  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Int,
      header_hex: String,
      feature: Array[Float])

  /** Wrap a text column as a binary payload frame (stand-in for real
    * media bytes; schema identical to what an image table would use).
    */
  def packAsMedia(df: DataFrame, idCol: String, textCol: String,
      mediaType: String = "text/plain"): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(mediaType).as("media_type"),
      length(encode(col(textCol), "UTF-8")).as("n_bytes"))
      .as[MediaRecord]
  }

  /** PNG signature (RFC 2083 §3.1, first 4 of the 8 magic bytes). */
  def isPng(payload: Array[Byte]): Boolean =
    payload.length >= 8 &&
      payload(0) == 0x89.toByte && payload(1) == 0x50.toByte &&
      payload(2) == 0x4E.toByte && payload(3) == 0x47.toByte

  /** REAL image decode via `javax.imageio` (JDK-only, so it works on
    * bare executors): payload → BufferedImage → (width, height,
    * dim-length luminance feature). The feature samples `dim` pixels
    * at proportional row-major positions and converts each to
    * integer-arithmetic BT.601 luma — deterministic across JVMs (no
    * float color math). Returns None when the payload is not a
    * decodable image, letting callers fall back to [[stubDecode]];
    * formats beyond what the JDK's ImageIO registry handles (JPEG,
    * PNG, GIF, BMP) remain honestly stubbed.
    */
  def decodeImage(payload: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] = {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null } // torn/corrupt payload
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val n = w.toLong * h
      val feat = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        val idx = if (dim == 1) 0L else i.toLong * (n - 1) / (dim - 1)
        val rgb = img.getRGB((idx % w).toInt, (idx / w).toInt)
        val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        feat(i) = luma / 255.0f
        i += 1
      }
      Some((w, h, feat))
    }
  }

  /** JPEG/JFIF signature (SOI marker + first marker byte). */
  def isJpeg(payload: Array[Byte]): Boolean =
    payload.length >= 3 &&
      payload(0) == 0xFF.toByte && payload(1) == 0xD8.toByte &&
      payload(2) == 0xFF.toByte

  /** RIFF/WAVE signature (RIFF container magic + WAVE form type). */
  def isWav(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
      payload(10) == 'V' && payload(11) == 'E'

  final case class WavInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int, nFrames: Long)

  /** REAL audio decode for PCM16 WAV — the one mainstream audio format
    * that needs no codec library, just the RIFF chunk walk (fmt +
    * data). The feature samples `dim` frames at proportional positions
    * (first channel, little-endian int16, scaled to [-1, 1) by integer
    * arithmetic — deterministic across JVMs). Returns None for
    * non-WAV, truncated, or non-PCM16 payloads, letting callers fall
    * back to [[stubDecode]]; compressed audio (MP3/AAC/…) remains
    * honestly stubbed.
    */
  def decodeWav(payload: Array[Byte], dim: Int): Option[(WavInfo, Array[Float])] = {
    if (!isWav(payload)) return None
    def leInt(o: Int) = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
      ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
    def leShort(o: Int) = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // format, channels, rate, bits
    var data: Option[(Int, Int)] = None          // offset, length
    while (off + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(payload, off, 4, "US-ASCII")
      val len = leInt(off + 4)
      if (len < 0 || off + 8 + len > payload.length) return None // torn chunk
      if (id == "fmt " && len >= 16)
        fmt = Some((leShort(off + 8), leShort(off + 10),
          leInt(off + 12), leShort(off + 22)))
      else if (id == "data") data = Some((off + 8, len))
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((1, ch, rate, 16)), Some((dataOff, dataLen))) if ch > 0 =>
        val frameBytes = ch * 2
        val nFrames = dataLen.toLong / frameBytes
        val feat = new Array[Float](dim)
        if (nFrames > 0) {
          var i = 0
          while (i < dim) {
            val f = if (dim == 1) 0L else i.toLong * (nFrames - 1) / (dim - 1)
            val o = dataOff + (f * frameBytes).toInt
            feat(i) = leShort(o).toShort / 32768.0f
            i += 1
          }
        }
        Some((WavInfo(rate, ch, 16, nFrames), feat))
      case _ => None // non-PCM16: honestly undecoded
    }
  }

  /** STUB decoder — a real implementation would hand each batch of
    * payloads to an image/audio codec (JNI or subprocess). The fake is
    * deterministic in the payload bytes so tests and oracles can rely
    * on it: feature[i] = byte[i * stride] / 128.0.
    */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload.nonEmpty) {
      val stride = math.max(1, payload.length / dim)
      var i = 0
      while (i < dim) {
        out(i) = payload((i * stride) % payload.length) / 128.0f
        i += 1
      }
    }
    out
  }

  final case class Frame(
      media_id: Long,
      frame_no: Int,
      payload: Array[Byte])

  /** Frame sampling: split each payload into fixed-size frames and
    * keep every `every`-th (video keyframe-sampling shape). The byte
    * plumbing is real; only the codec that would delimit true frames
    * is stubbed by the fixed size.
    */
  def frameSample(media: Dataset[MediaRecord], frameBytes: Int,
      every: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .collect { case (bytes, i) if i % every == 0 =>
          Frame(r.media_id, i, bytes) }
    }
  }

  /** STUB resize: deterministic re-dimension of a feature vector
    * (truncate or cycle-pad) — stands in for image resize / audio
    * resample, which would re-decode in a real pipeline.
    */
  def resizeStub(features: Dataset[MediaFeatures], newDim: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val v = Array.tabulate(newDim)(i =>
        if (f.feature.isEmpty) 0.0f else f.feature(i % f.feature.length))
      f.copy(feature = v)
    }
  }

  /** Batched per-partition feature extraction. `batchSize` controls
    * the unit handed to the decoder (mirrors mapInPandas arrow-batch
    * sizing); the transform is iterator-to-iterator so a partition is
    * never fully materialized.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would process `batch` as one unit here; PNG
        // and JPEG payloads take the real javax.imageio path, PCM16
        // WAV the pure-JDK RIFF walk, everything else the
        // deterministic stub
        batch.iterator.map { r =>
          val hex = r.payload.take(8).map(b => f"${b & 0xff}%02X").mkString
          val feat =
            (if (isPng(r.payload) || isJpeg(r.payload))
               decodeImage(r.payload, dim).map(_._3)
             else if (isWav(r.payload)) decodeWav(r.payload, dim).map(_._2)
             else None).getOrElse(stubDecode(r.payload, dim))
          MediaFeatures(r.media_id, r.n_bytes, hex, feat)
        }
      }
    }
  }

  /** Perceptual difference hash (dHash) of a decodable image: the
    * luma plane box-averages onto a 9×8 grid with pure INTEGER
    * arithmetic (long pixel sums / box size — deterministic across
    * JVMs), then each of the 64 horizontal neighbor pairs contributes
    * one bit (left > right), row-major MSB-first. Resizes and mild
    * global brightness shifts preserve the gradient signs, so
    * near-duplicate images land within a few Hamming bits — group
    * equal hashes for exact-collision dedup, or feed the q33-style
    * 4-block banded Hamming join for distance ≤ r candidates. None
    * for payloads ImageIO cannot decode (torn bytes, non-images).
    */
  def dHash(payload: Array[Byte]): Option[Long] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val grid = Array.ofDim[Long](8, 9)
      var gy = 0
      while (gy < 8) {
        val y0 = gy * h / 8
        val y1 = math.max((gy + 1) * h / 8, y0 + 1) min h
        var gx = 0
        while (gx < 9) {
          val x0 = gx * w / 9
          val x1 = math.max((gx + 1) * w / 9, x0 + 1) min w
          var sum = 0L
          var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              n += 1
              x += 1
            }
            y += 1
          }
          grid(gy)(gx) = if (n == 0) 0L else sum / n
          gx += 1
        }
        gy += 1
      }
      var hash = 0L
      gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          hash = (hash << 1) | (if (grid(gy)(gx) > grid(gy)(gx + 1)) 1L else 0L)
          gx += 1
        }
        gy += 1
      }
      Some(hash)
    }
  }

  final case class MediaHash(media_id: Long, dhash: Option[Long])

  /** Per-record perceptual hashes at the same batched codec boundary
    * as [[extractFeatures]] — the candidate key for image-level
    * near-dup grouping. Undecodable payloads carry None (kept, so the
    * caller can route them to byte-level fingerprinting instead).
    */
  def imageHashes(media: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.map(r =>
        MediaHash(r.media_id, dHash(r.payload))))
    }
  }

  /** Hamming distance between two 64-bit perceptual hashes. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Deterministic synthetic PNGs for the image near-dup gate query
    * (the environment ships no real image corpus). The codec path the
    * gate exercises — PNG encode → ImageIO decode → integer luma grid
    * → dHash — is the real one; only the pixel source is synthetic.
    * Determinism: pixels are pure integer functions of (seed, x, y)
    * and PNG is lossless, so decode returns the exact pixels and the
    * hash is reproducible across JVMs and runs.
    */
  object SyntheticImages {

    private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.setUseCache(false)
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Diagonal gradient keyed by `seed` (rich horizontal structure, so
      * dHash bits are meaningful). `scale` doubles/triples resolution
      * without changing the pattern — a resize twin; `brighten` shifts
      * luma uniformly (values stay below the 255 clamp by
      * construction, so gradient SIGNS — and usually the hash — are
      * preserved exactly).
      */
    def gradientPng(seed: Long, scale: Int, brighten: Int): Array[Byte] = {
      // mix the seed first: callers often pass ids sharing a stride
      // (every 7th doc), which raw mod-arithmetic would collapse into
      // a handful of identical patterns
      val h = seed * 0x9E3779B97F4A7C15L
      val a = 1 + java.lang.Long.remainderUnsigned(h, 9).toInt
      val b = 1 + java.lang.Long.remainderUnsigned(h >>> 8, 11).toInt
      png(36 * scale, 32 * scale) { (x, y) =>
        val v = ((x / scale * a + y / scale * b) % 200 + brighten)
          .max(0).min(255)
        (v << 16) | (v << 8) | v
      }
    }

    /** Structureless hash-noise image — far from every gradient. */
    def noisePng(seed: Long): Array[Byte] =
      png(36, 32) { (x, y) =>
        val v = ((x * 2654435761L + y * 40503L + seed * 0x9E3779B9L) >>> 7)
          .toInt & 0xff
        (v << 16) | (v << 8) | v
      }
  }
}
