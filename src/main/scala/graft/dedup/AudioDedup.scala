package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual AUDIO near-deduplication — the audio twin of
  * [[ImageDedup]], completing the multimodal near-dup family over the
  * payload types the repo decodes (WAV PCM via
  * [[graft.multimodal.Multimodal.WavDecoder]]). The signature is the
  * classic energy-envelope sign hash (the shape acoustic fingerprints
  * like Haitsma–Kalker reduce to at one band): decode → mono mixdown →
  * 65 equal windows → exact integer window energies → 64 bits of
  * energy-GRADIENT signs. Same banded-LSH candidate machinery as the
  * image tier ([[HammingLsh]]).
  *
  * Invariances the tests pin:
  *  - lossless re-encode (decode → encodeWav → decode is sample-exact
  *    for 16-bit PCM) ⇒ hash identical;
  *  - uniform GAIN scaling: energies scale by g² uniformly, so every
  *    strict energy-gradient comparison is preserved exactly when the
  *    scaled samples stay exact (e.g. halving even-valued samples);
  *    for arbitrary gains the comparison survives as long as window
  *    margins exceed the integer-rounding perturbation — the honest
  *    bound, unlike the image tier's exactly-invariant brightness shift.
  *
  * One mapPartitions decode scan (payload bytes never shuffle; only
  * (id, 8-byte hash) rows move), pigeonhole-complete banded candidates,
  * exact Hamming verify, default-on star-pair skew guard — the 100 TB
  * shape of the whole family.
  */
object AudioDedup {

  /** 64-bit energy-envelope sign hash of a WAV payload: bit w set iff
    * energy(window w+1) > energy(window w) over 65 equal windows of the
    * mono mixdown (multi-channel frames average). None if undecodable
    * or shorter than 65 samples (no meaningful envelope).
    */
  def energyHash(payload: Array[Byte], windows: Int = 65): Option[Long] = {
    require(windows >= 2 && windows <= 65,
      s"windows must be in [2, 65] (64 hash bits; a larger value would wrap the long shift), got $windows")
    graft.multimodal.Multimodal.WavDecoder.decodePcm(payload).flatMap {
      case (pcm, _, channels) =>
        val ch = math.max(1, channels)
        val nFrames = pcm.length / ch
        if (nFrames < windows) None
        else {
          // exact integer energies: mono frame = channel average (rounded
          // toward zero), energy = sum of squares in Long
          val e = new Array[Long](windows)
          var f = 0
          while (f < nFrames) {
            val w = (f.toLong * windows / nFrames).toInt
            var s = 0
            var c = 0
            while (c < ch) { s += pcm(f * ch + c); c += 1 }
            val m = s / ch
            e(w) += m.toLong * m
            f += 1
          }
          var h = 0L
          var w = 0
          while (w < windows - 1) {
            if (e(w + 1) > e(w)) h |= 1L << w
            w += 1
          }
          Some(h)
        }
    }
  }

  /** One distributed scan computing (id, dhash) per decodable clip —
    * the only pass that touches payload bytes.
    */
  def energyHashes(
      spark: SparkSession,
      clips: DataFrame,
      idCol: String = "id",
      payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    clips
      .select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) => energyHash(payload).map(h => (id, h)) }
      }
      .toDF("id", "dhash")
  }

  /** Near-duplicate audio pairs: banded energy-hash buckets → exact
    * Hamming verify ([[HammingLsh.bandedPairs]] semantics and skew
    * guard). Output (id_a, id_b, hamming), id_a < id_b.
    */
  def audioNearDupPairs(
      spark: SparkSession,
      clips: DataFrame,
      idCol: String = "id",
      payloadCol: String = "payload",
      maxDist: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 4096): DataFrame = {
    // decode is the expensive pass; the band rows and both verify sides
    // consume it, so it materializes once (8 bytes + id per clip)
    val hashed = energyHashes(spark, clips, idCol, payloadCol).persist()
    HammingLsh.bandedPairs(hashed, "dhash", maxDist, bands, maxBucketSize)
  }
}
