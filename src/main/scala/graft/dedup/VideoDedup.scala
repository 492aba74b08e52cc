package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual VIDEO near-deduplication — the clip tier completing the
  * image/audio family over the repo's real codecs (APNG lossless,
  * MJPEG): sample up to `maxFrames` frames through the
  * [[graft.multimodal.Multimodal.Decoder]] boundary, average them into
  * ONE temporal-mean image (exact integer arithmetic), and dHash that
  * ([[ImageDedup.dHashFromGray]]) — a clip signature invariant to
  * frame-preserving re-encodes and, exactly, to uniform brightness
  * shifts applied to every frame: with n frames each shifted +s, the
  * per-pixel floor((sum + n·s)/n) = floor(sum/n) + s, so the averaged
  * image shifts uniformly and the BT.601 gradient bits are unchanged
  * (the same invariance chain as the still-image tier). Same banded
  * candidate machinery ([[HammingLsh]]), same one-decode-scan shape —
  * payload bytes never shuffle.
  */
object VideoDedup {

  /** 64-bit temporal-mean dHash of a video payload (APNG/MJPEG), or
    * None if the header or every sampled frame is undecodable. Frames
    * that decode to unexpected sizes are skipped (skip-not-throw).
    */
  def videoHash(
      payload: Array[Byte],
      decoder: graft.multimodal.Multimodal.Decoder =
        graft.multimodal.Multimodal.ApngDecoder,
      maxFrames: Int = 4): Option[Long] = {
    val (w, h) = decoder.dims(payload)
    if (w <= 0 || h <= 0 || w.toLong * h * 3 > Int.MaxValue - 8) return None
    val frames = decoder.decodeFrames(payload, maxFrames)
      .filter(_.length == w * h * 3)
    if (frames.isEmpty) return None
    val n = frames.length
    val sum = new Array[Int](w * h * 3)
    frames.foreach { f =>
      var i = 0
      while (i < sum.length) { sum(i) += f(i) & 0xff; i += 1 }
    }
    val avg = new Array[Byte](sum.length)
    var i = 0
    while (i < sum.length) { avg(i) = (sum(i) / n).toByte; i += 1 }
    Some(ImageDedup.dHashFromGray(ImageDedup.grayThumbFromRgb(avg, w, h)))
  }

  /** One distributed scan computing (id, dhash) per decodable clip. */
  def videoHashes(
      spark: SparkSession,
      clips: DataFrame,
      idCol: String = "id",
      payloadCol: String = "payload",
      decoder: graft.multimodal.Multimodal.Decoder =
        graft.multimodal.Multimodal.ApngDecoder,
      maxFrames: Int = 4): DataFrame = {
    import spark.implicits._
    clips
      .select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, p) => videoHash(p, decoder, maxFrames).map(h => (id, h)) }
      }
      .toDF("id", "dhash")
  }

  /** Near-duplicate clip pairs via the shared banded core
    * ([[HammingLsh.bandedPairs]] semantics, completeness, and skew
    * guard). Output (id_a, id_b, hamming), id_a < id_b.
    */
  def videoNearDupPairs(
      spark: SparkSession,
      clips: DataFrame,
      idCol: String = "id",
      payloadCol: String = "payload",
      decoder: graft.multimodal.Multimodal.Decoder =
        graft.multimodal.Multimodal.ApngDecoder,
      maxFrames: Int = 4,
      maxDist: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 4096): DataFrame = {
    val hashed = videoHashes(spark, clips, idCol, payloadCol, decoder, maxFrames).persist()
    HammingLsh.bandedPairs(hashed, "dhash", maxDist, bands, maxBucketSize)
  }
}
