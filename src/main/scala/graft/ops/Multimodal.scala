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
        // payloads take the real javax.imageio path, everything else
        // the deterministic stub
        batch.iterator.map { r =>
          val hex = r.payload.take(8).map(b => f"${b & 0xff}%02X").mkString
          val feat =
            (if (isPng(r.payload)) decodeImage(r.payload, dim).map(_._3)
             else None).getOrElse(stubDecode(r.payload, dim))
          MediaFeatures(r.media_id, r.n_bytes, hex, feat)
        }
      }
    }
  }
}
