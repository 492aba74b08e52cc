package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

/** Multimodal column handling for training-data pipelines (brief): media
  * travels as opaque `binary` payload columns plus a typed metadata struct;
  * decode/feature-extract/resize/frame-sample run distributed over
  * partitions of byte payloads.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration — is
  * real and tested. The actual media decoding is STUBBED (no image/audio
  * codecs in this environment): [[DecodeStub]] derives deterministic fake
  * "pixels" from the payload bytes so the pipeline shape (bytes → frames →
  * features) is exercised end to end. Swap [[Decoder]] with a real codec
  * binding in production.
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
