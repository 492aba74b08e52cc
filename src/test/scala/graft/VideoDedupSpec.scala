package graft

import graft.dedup.VideoDedup
import graft.multimodal.Multimodal

/** Video temporal-mean dHash: invariances (lossless re-encode, exact
  * all-frame brightness shift), frame-subset sensitivity, planted-pair
  * recovery, and the skip-not-throw decode contract.
  */
class VideoDedupSpec extends SparkTestBase {

  private def frames(seed: Int, n: Int = 4, w: Int = 16, h: Int = 12): Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Array.fill(w * h * 3)((48 + rnd.nextInt(128)).toByte)) // [48, 175]
  }

  test("hash invariant to APNG re-encode and exact all-frame brightness shift") {
    (0 until 30).foreach { s =>
      val fs = frames(s)
      val apng = Multimodal.encodeApng(fs, 16, 12)
      val h = VideoDedup.videoHash(apng)
      assert(h.isDefined, s"undecodable fixture (seed $s)")
      val re = Multimodal.encodeApng(
        Multimodal.ApngDecoder.decodeFrames(apng, 4).toSeq, 16, 12)
      assert(VideoDedup.videoHash(re) === h, s"re-encode changed hash (seed $s)")
      val shifted = Multimodal.encodeApng(
        fs.map(_.map(b => ((b & 0xff) + 20).toByte)), 16, 12)
      assert(VideoDedup.videoHash(shifted) === h, s"brightness shift changed hash (seed $s)")
    }
  }

  test("temporal mean is frame-sensitive: replacing one frame generally changes the hash") {
    val fs = frames(5)
    val h1 = VideoDedup.videoHash(Multimodal.encodeApng(fs, 16, 12))
    val h2 = VideoDedup.videoHash(Multimodal.encodeApng(
      fs.init :+ frames(99).head, 16, 12))
    assert(h1 !== h2)
  }

  test("planted copies pair through the banded pipeline; undecodable payloads drop") {
    import spark.implicits._
    val rows = (0 until 20).flatMap { i =>
      val fs = frames(i + 50)
      val apng = Multimodal.encodeApng(fs, 16, 12)
      if (i < 4)
        Seq((i.toLong, apng),
          (i + 500L, Multimodal.encodeApng(
            fs.map(_.map(b => ((b & 0xff) + 15).toByte)), 16, 12)))
      else Seq((i.toLong, apng))
    } ++ Seq((900L, Array[Byte](1, 2, 3)))
    val got = VideoDedup.videoNearDupPairs(spark, rows.toDF("id", "payload"),
        maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq === (0 until 4).map(i => (i.toLong, i + 500L, 0L)))
  }

  test("MJPEG clips hash through the same path (lossy codec, self-equal)") {
    val fs = frames(7, w = 8, h = 6).map(_.take(8 * 6 * 3))
    val mjpeg = Multimodal.encodeMjpeg(fs, 8, 6)
    val h = VideoDedup.videoHash(mjpeg, Multimodal.MjpegDecoder)
    assert(h.isDefined)
    // decode->re-encode of an MJPEG is lossy, so only self-identity is
    // asserted; the lossless invariance claims live on the APNG path
    assert(VideoDedup.videoHash(mjpeg, Multimodal.MjpegDecoder) === h)
  }
}
