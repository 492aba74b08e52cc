package graft

import graft.dedup.ImageDedup
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Perceptual image near-dedup pipeline: planted copies recovered through
  * the banded join, distant images excluded, undecodable payloads
  * skipped, the skew guard keeps flat clusters connected, and the
  * parameter contracts fail loudly.
  */
class ImageDedupSpec extends SparkTestBase {

  private def randImg(seed: Int, w: Int = 16, h: Int = 12): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(w * h * 3)((40 + rnd.nextInt(144)).toByte) // [40, 183]
  }

  test("planted brightness-shift and re-encode copies pair; noise images don't") {
    import spark.implicits._
    val rows = (0 until 30).flatMap { i =>
      val rgb = randImg(i)
      val base = (i.toLong, Multimodal.encodePng(rgb, 16, 12))
      if (i < 5) {
        val shifted = rgb.map(b => ((b & 0xff) + 25).toByte)
        Seq(base, (i + 100L, Multimodal.encodePng(shifted, 16, 12)))
      } else if (i < 10) {
        val re = Multimodal.PngDecoder.decodeRgb(base._2).get._1
        Seq(base, (i + 200L, Multimodal.encodePng(re, 16, 12)))
      } else Seq(base)
    }
    val got = ImageDedup.imageNearDupPairs(spark, rows.toDF("id", "payload"),
        maxDist = 3, bands = 4, pixTol = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val expected = ((0 until 5).map(i => (i.toLong, i + 100L, 0L)) ++
      (5 until 10).map(i => (i.toLong, i + 200L, 0L))).sorted
    assert(got.toSeq === expected)
  }

  test("undecodable payloads drop from the hash scan, not throw") {
    import spark.implicits._
    val rows = Seq(
      (1L, Multimodal.encodePng(randImg(1), 16, 12)),
      (2L, Array[Byte](1, 2, 3, 4)),
      (3L, Array.empty[Byte]))
    val hashed = ImageDedup.dHashes(spark, rows.toDF("id", "payload")).collect()
    assert(hashed.map(_.getLong(0)).toSet === Set(1L))
    // and the pair pipeline runs clean over the same rows
    assert(ImageDedup.imageNearDupPairs(spark, rows.toDF("id", "payload"),
      maxDist = 3, bands = 4).count() === 0L)
  }

  test("skew guard: an identical-image cluster larger than maxBucketSize stays connected via star pairs") {
    import spark.implicits._
    val flat = Multimodal.encodePng(Array.fill(16 * 12 * 3)(100.toByte), 16, 12)
    val rows = (0 until 12).map(i => (i.toLong, flat)) :+
      (50L, Multimodal.encodePng(randImg(99), 16, 12))
    val pairs = ImageDedup.imageNearDupPairs(spark, rows.toDF("id", "payload"),
        maxDist = 3, bands = 4, maxBucketSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // star pairs: every cluster member pairs with the representative (min
    // id 0), so the 12-clique resolves connected without C(12,2) rows
    assert(pairs.toSeq === (1 until 12).map(i => (0L, i.toLong)))
  }

  test("pixel verify rejects a gradient-identical but pixel-different pair at tight tolerance") {
    import spark.implicits._
    // two-pixel-wide rows with a DOUBLED contrast step: gradients (signs)
    // match the base image, centered pixel values don't
    def img(step: Int): Array[Byte] = {
      val px = Array.tabulate(16 * 12 * 3) { i =>
        val x = (i / 3) % 16
        (80 + (if (x % 2 == 0) 0 else step)).toByte
      }
      px
    }
    val rows = Seq((1L, Multimodal.encodePng(img(20), 16, 12)),
      (2L, Multimodal.encodePng(img(60), 16, 12)))
    val loose = ImageDedup.imageNearDupPairs(spark, rows.toDF("id", "payload"),
      maxDist = 3, bands = 4, pixTol = -1).count()
    val tight = ImageDedup.imageNearDupPairs(spark, rows.toDF("id", "payload"),
      maxDist = 3, bands = 4, pixTol = 2).count()
    assert(loose === 1L, "same gradient signs => hamming 0 => pairs without pixel verify")
    assert(tight === 0L, "centered pixel difference must reject at tol 2")
  }

  test("parameter contracts fail loudly") {
    import spark.implicits._
    val df = Seq((1L, Multimodal.encodePng(randImg(1), 16, 12))).toDF("id", "payload")
    intercept[IllegalArgumentException] {
      ImageDedup.imageNearDupPairs(spark, df, maxDist = 4, bands = 4)
    }
    intercept[IllegalArgumentException] {
      ImageDedup.imageNearDupPairs(spark, df, maxDist = 1, bands = 3)
    }
  }

  test("layout invariance: same pairs under different input partitioning") {
    import spark.implicits._
    val rows = (0 until 20).flatMap { i =>
      val rgb = randImg(i + 7)
      val base = (i.toLong, Multimodal.encodePng(rgb, 16, 12))
      if (i < 4) Seq(base, (i + 500L,
        Multimodal.encodePng(rgb.map(b => ((b & 0xff) + 10).toByte), 16, 12)))
      else Seq(base)
    }
    def run(parts: Int) = ImageDedup.imageNearDupPairs(spark,
        rows.toDF("id", "payload").repartition(parts), maxDist = 3, bands = 4, pixTol = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(run(1) === run(7))
    assert(run(1) === (0 until 4).map(i => (i.toLong, i + 500L, 0L)))
  }
}
