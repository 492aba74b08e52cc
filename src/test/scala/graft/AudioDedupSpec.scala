package graft

import graft.dedup.AudioDedup
import graft.multimodal.Multimodal

/** Audio energy-envelope near-dedup: hash invariances (lossless
  * re-encode, exact gain halving on even samples), planted-pair
  * recovery through the banded pipeline, and the skip-not-throw decode
  * contract.
  */
class AudioDedupSpec extends SparkTestBase {

  private def clip(seed: Int, windows: Int = 65, perWin: Int = 32): Array[Short] = {
    val rnd = new scala.util.Random(seed)
    val samples = new Array[Short](windows * perWin)
    (0 until windows).foreach { w =>
      val amp = (100 + 50 * rnd.nextInt(12)).toShort // even, 50 apart
      (0 until perWin).foreach { j =>
        samples(w * perWin + j) = if (j % 2 == 0) amp else (-amp).toShort
      }
    }
    samples
  }

  test("hash invariant to lossless re-encode and exact gain halving") {
    (0 until 50).foreach { s =>
      val base = clip(s)
      val wav = Multimodal.encodeWav(base, 16000)
      val h = AudioDedup.energyHash(wav)
      assert(h.isDefined)
      val re = Multimodal.encodeWav(Multimodal.WavDecoder.decodePcm(wav).get._1, 16000)
      assert(AudioDedup.energyHash(re) === h, s"re-encode changed hash (seed $s)")
      val halved = Multimodal.encodeWav(base.map(x => (x / 2).toShort), 16000)
      assert(AudioDedup.energyHash(halved) === h, s"exact halving changed hash (seed $s)")
    }
  }

  test("hash bits are exactly the window-energy gradient signs") {
    val samples = clip(7)
    val h = AudioDedup.energyHash(Multimodal.encodeWav(samples, 16000)).get
    val e = Array.tabulate(65) { w =>
      (0 until 32).map(j => math.pow(samples(w * 32 + j).toDouble, 2)).sum
    }
    (0 until 64).foreach { w =>
      assert((((h >>> w) & 1L) == 1L) === (e(w + 1) > e(w)), s"bit $w")
    }
  }

  test("planted gain and re-encode copies pair; noise clips don't; bad payloads drop") {
    import spark.implicits._
    val rows = (0 until 30).flatMap { i =>
      val base = clip(i + 100)
      val wav = Multimodal.encodeWav(base, 16000)
      if (i < 4)
        Seq((i.toLong, wav),
          (i + 500L, Multimodal.encodeWav(base.map(x => (x / 2).toShort), 16000)))
      else Seq((i.toLong, wav))
    } ++ Seq(
      (900L, Array[Byte](9, 9, 9)),                     // undecodable
      (901L, Multimodal.encodeWav(clip(1).take(40), 16000))) // < 65 samples
    val got = AudioDedup.audioNearDupPairs(spark, rows.toDF("id", "payload"),
        maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq === (0 until 4).map(i => (i.toLong, i + 500L, 0L)))
  }

  test("multi-channel mixdown: a stereo-duplicated clip hashes like its mono source") {
    // interleave L=R: mono mixdown averages back to the source samples
    val mono = clip(42)
    val stereoPcm = mono.flatMap(s => Array(s, s))
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val bytes = new Array[Byte](stereoPcm.length * 2)
    stereoPcm.zipWithIndex.foreach { case (s, i) =>
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, mono.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val stereoHash = AudioDedup.energyHash(bos.toByteArray)
    val monoHash = AudioDedup.energyHash(Multimodal.encodeWav(mono, 16000))
    assert(stereoHash === monoHash)
  }
}
