package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

/** Multimodal column handling for training-data pipelines (brief): media
  * travels as opaque `binary` payload columns plus a typed metadata struct;
  * decode/feature-extract/resize/frame-sample run distributed over
  * partitions of byte payloads.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration — is
  * real and tested. IMAGE decoding is REAL: [[PngDecoder]]/[[encodePng]]
  * round-trip PNG payloads through `javax.imageio` (in the JDK — no
  * external codecs needed), and [[resizeNearest]] is a real
  * nearest-neighbor resampler over decoded pixels. Audio/video decoding
  * remains honestly STUBBED ([[DecodeStub]]: deterministic frame split of
  * the raw payload) behind the same [[Decoder]] boundary — swap in a
  * codec binding in production.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  case class MediaMeta(kind: String, width: Int, height: Int, sampleRateHz: Int)

  case class MediaRow(id: Long, payload: Array[Byte], kind: String, width: Int, height: Int, sampleRateHz: Int)

  case class MediaFeatures(id: Long, kind: String, nBytes: Long, nFrames: Int, histogram: Array[Long])

  /** Decode boundary: bytes in, "frames" of bytes out. */
  trait Decoder extends Serializable {
    def decodeFrames(payload: Array[Byte], maxFrames: Int): Array[Array[Byte]]
  }

  /** STUB decoder: deterministic frame split of the raw payload (stands in
    * for image/video decoding, which needs codecs absent here — ???-grade
    * stub by design, see object Scaladoc).
    */
  object DecodeStub extends Decoder {
    def decodeFrames(payload: Array[Byte], maxFrames: Int): Array[Array[Byte]] = {
      if (payload.isEmpty) return Array.empty
      val frameSize = math.max(1, payload.length / math.max(1, maxFrames))
      payload.grouped(frameSize).take(maxFrames).map(identity).toArray
    }
  }

  /** Encode packed row-major RGB bytes (3 bytes/pixel) as a PNG payload —
    * the real, lossless image codec in the JDK (`javax.imageio`). Runs in
    * executor tasks (headless-safe: no AWT toolkit involved).
    */
  def encodePng(rgb: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(rgb.length == width * height * 3, s"need ${width * height * 3} bytes, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < width * height) {
      val i = p * 3
      img.setRGB(p % width, p / width,
        ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
      p += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decoder: PNG/JPEG/BMP payload → one frame of packed
    * row-major RGB bytes via `javax.imageio`. Undecodable payloads yield
    * zero frames (the contract a quality-filter pipeline wants: skip, not
    * throw, on corrupt media).
    */
  object PngDecoder extends Decoder {

    /** One ImageIO pass: (packed RGB bytes, width, height), or None for an
      * undecodable payload. NonFatal, not just IOException: ImageIO
      * readers throw RuntimeExceptions (IndexOutOfBounds,
      * NegativeArraySize, ...) on malformed headers, and the contract is
      * skip-not-throw.
      */
    def decodeRgb(payload: Array[Byte]): Option[(Array[Byte], Int, Int)] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      // dimensions whose packed-RGB buffer exceeds a JVM array are
      // skipped too — new Array[Byte](w*h*3) would otherwise throw
      // NegativeArraySizeException on Int overflow, outside any catch
      if (img == null || img.getWidth.toLong * img.getHeight * 3 > Int.MaxValue - 8) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new Array[Byte](w * h * 3)
        var p = 0
        while (p < w * h) {
          val px = img.getRGB(p % w, p / w)
          out(p * 3) = ((px >> 16) & 0xff).toByte
          out(p * 3 + 1) = ((px >> 8) & 0xff).toByte
          out(p * 3 + 2) = (px & 0xff).toByte
          p += 1
        }
        Some((out, w, h))
      }
    }

    def decodeFrames(payload: Array[Byte], maxFrames: Int): Array[Array[Byte]] =
      if (maxFrames < 1) Array.empty
      else decodeRgb(payload).map(_._1).toArray

    /** (width, height) of a decodable payload, (-1, -1) otherwise. Reads
      * only the image header/raster metadata — no per-pixel extraction or
      * packed-RGB allocation (metadata-only callers must not pay the full
      * decode of [[decodeRgb]]).
      */
    def dims(payload: Array[Byte]): (Int, Int) = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) (-1, -1) else (img.getWidth, img.getHeight)
    }
  }

  /** Real nearest-neighbor resize over packed RGB pixels: output pixel
    * (x, y) samples input pixel (⌊x·w/ow⌋, ⌊y·h/oh⌋).
    */
  def resizeNearest(rgb: Array[Byte], w: Int, h: Int, ow: Int, oh: Int): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        val sx = x * w / ow
        val si = (sy * w + sx) * 3
        val di = (y * ow + x) * 3
        out(di) = rgb(si); out(di + 1) = rgb(si + 1); out(di + 2) = rgb(si + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Attach a metadata struct column to a payload DataFrame. */
  def withMeta(df: DataFrame, payloadCol: String, meta: MediaMeta): DataFrame =
    df.withColumn("meta", struct(
      lit(meta.kind).as("kind"),
      lit(meta.width).as("width"),
      lit(meta.height).as("height"),
      lit(meta.sampleRateHz).as("sample_rate_hz")))

  /** Distributed decode + featurize: one pass per partition over payload
    * batches (the Scala analog of `mapInPandas` batch plumbing). Features
    * here are a 16-bucket byte histogram per item — deterministic, cheap,
    * and shaped like a real extractor's output (fixed-width vector).
    */
  def extractFeatures(
      spark: SparkSession,
      media: Dataset[MediaRow],
      decoder: Decoder = DecodeStub,
      maxFrames: Int = 4): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val frames = decoder.decodeFrames(r.payload, maxFrames)
        val hist = new Array[Long](16)
        frames.foreach(_.foreach(b => hist((b & 0xff) >> 4) += 1))
        MediaFeatures(r.id, r.kind, r.payload.length.toLong, frames.length, hist)
      }
    }
  }

  /** "Resize" stub: byte decimation keeping every `factor`-th byte (binary
    * in → smaller binary out, the shape of a real resampler). Runs inside
    * the same partition pass as [[extractFeatures]].
    */
  def resize(payload: Array[Byte], factor: Int): Array[Byte] = {
    require(factor > 0)
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }
}
