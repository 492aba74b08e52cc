package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual IMAGE near-deduplication — the dedup family extended to the
  * multimodal columns the repo already decodes (the reference, a vector
  * DB, has no media surface; the published method is the difference hash
  * of the classic perceptual-hash family, e.g. Krawetz's dHash
  * exposition, plus banded-LSH candidate generation exactly like text
  * MinHash).
  *
  * Pipeline shape (100 TB framing):
  *   1. decode → grayscale → 9×8 thumbnail → 64-bit dHash: ONE
  *      mapPartitions scan over (id, payload), embarrassingly parallel,
  *      nothing driver-resident; undecodable payloads drop (the
  *      skip-not-throw contract of [[graft.multimodal.Multimodal]]).
  *      Only (id, 8-byte hash, 72-byte thumb) survives the scan — the
  *      payload bytes never shuffle.
  *   2. Hamming-banded bucketing: the 64-bit hash splits into `bands`
  *      equal slices; pairs within Hamming distance `maxDist < bands`
  *      share at least one EXACT band (pigeonhole), so an equi-join on
  *      (band, slice) is a complete candidate generator — never an
  *      all-pairs product, same as the MinHash/SimHash band joins.
  *   3. verify inside buckets: exact 64-bit Hamming distance gate plus a
  *      brightness-invariant pixel-space check on the mean-centered
  *      thumbnails (integer-exact: 72·g − sum comparisons, no floats).
  *
  * dHash properties the tests pin: invariant to lossless re-encoding
  * (pixels identical ⇒ hash identical) and to global brightness shifts
  * that don't clip — the BT.601 fixed-point luma weights sum to 256, so
  * a uniform +s on RGB shifts every luma by exactly s and leaves every
  * gradient comparison, hence every bit, unchanged.
  */
object ImageDedup {

  /** BT.601 fixed-point luma: (77·r + 150·g + 29·b) >> 8. Weights sum to
    * 256 exactly — the brightness-shift invariance of [[dHash]] depends
    * on it (luma(p + s) = luma(p) + s with no rounding drift).
    */
  @inline private def luma(r: Int, g: Int, b: Int): Int =
    (77 * r + 150 * g + 29 * b) >> 8

  /** Grayscale `tw`×`th` thumbnail of a packed-RGB buffer:
    * nearest-neighbor resize, then the fixed-point luma per pixel — the
    * ONE copy of the thumbnail geometry + luma convention the image AND
    * video ([[VideoDedup]]) tiers share, so their cross-modal invariance
    * claims cannot drift apart.
    */
  def grayThumbFromRgb(rgb: Array[Byte], w: Int, h: Int,
      tw: Int = 9, th: Int = 8): Array[Int] = {
    val small = graft.multimodal.Multimodal.resizeNearest(rgb, w, h, tw, th)
    Array.tabulate(tw * th) { p =>
      luma(small(p * 3) & 0xff, small(p * 3 + 1) & 0xff, small(p * 3 + 2) & 0xff)
    }
  }

  /** Grayscale `tw`×`th` thumbnail of a decodable image payload: one
    * ImageIO decode + [[grayThumbFromRgb]]. None for undecodable
    * payloads.
    */
  def grayThumb(payload: Array[Byte], tw: Int = 9, th: Int = 8): Option[Array[Int]] =
    graft.multimodal.Multimodal.PngDecoder.decodeRgb(payload).map { case (rgb, w, h) =>
      grayThumbFromRgb(rgb, w, h, tw, th)
    }

  /** 64-bit difference hash from a 9×8 grayscale thumbnail: bit
    * (y·8 + x) set iff gray(x+1, y) > gray(x, y) — the row-wise
    * horizontal-gradient sign field. 8 comparisons per row × 8 rows.
    */
  def dHashFromGray(gray: Array[Int], tw: Int = 9, th: Int = 8): Long = {
    require(gray.length == tw * th, s"need ${tw * th} gray pixels, got ${gray.length}")
    var h = 0L
    var y = 0
    while (y < th) {
      var x = 0
      while (x < tw - 1) {
        if (gray(y * tw + x + 1) > gray(y * tw + x)) h |= 1L << (y * (tw - 1) + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Perceptual difference hash of an image payload (None if
    * undecodable): decode → 9×8 grayscale → row-gradient sign bits.
    */
  def dHash(payload: Array[Byte]): Option[Long] =
    grayThumb(payload).map(g => dHashFromGray(g))

  /** One distributed scan computing (id, dhash, thumb) per decodable
    * image — the only pass that touches payload bytes. `images` must
    * carry (`idCol` long, `payloadCol` binary).
    */
  def dHashes(
      spark: SparkSession,
      images: DataFrame,
      idCol: String = "id",
      payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    images
      .select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          grayThumb(payload).map(g => (id, dHashFromGray(g), g))
        }
      }
      .toDF("id", "dhash", "thumb")
  }

  /** Near-duplicate image pairs: banded dHash buckets → exact verify.
    *
    * Guarantee: any pair at Hamming distance ≤ `maxDist` is REPORTED
    * (pigeonhole over `bands > maxDist` band slices), subject to the
    * skew guard below; reported pairs additionally pass the
    * mean-centered thumbnail check when `pixTol >= 0` — max over pixels
    * of |72·(g_a − g_b) − (sum_a − sum_b)| ≤ 72·pixTol, integer-exact
    * and invariant to uniform brightness shifts (both planted-copy
    * classes in the catalog row pass at pixTol = 0).
    *
    * Skew guard (same trade as [[Dedup.minhashLshPairs]], on by
    * default): a band bucket larger than `maxBucketSize` — a flat-color
    * thumbnail shared by millions of crops is a C(n,2) bomb at corpus
    * scale — contributes star pairs to its smallest id instead of all
    * pairs. Exact-duplicate clusters stay connected (every member pairs
    * with the representative); `maxBucketSize <= 0` disables.
    *
    * Output: (id_a, id_b, hamming), id_a < id_b.
    */
  def imageNearDupPairs(
      spark: SparkSession,
      images: DataFrame,
      idCol: String = "id",
      payloadCol: String = "payload",
      maxDist: Int = 3,
      bands: Int = 4,
      pixTol: Int = -1,
      maxBucketSize: Int = 4096): DataFrame = {
    // the decode scan is the expensive pass (ImageIO per payload), and
    // five plan branches consume it (band rows + both hash-verify sides
    // inside bandedPairs + both thumb-verify sides here), so
    // it materializes ONCE — unlike the text LSH kernels, recompute is
    // not cheap here. Storage is (id, 8-byte hash, 72-int thumb) per
    // image; Spark evicts LRU if the corpus outgrows the cache.
    val hashed = dHashes(spark, images, idCol, payloadCol).persist()

    // banded candidates + exact Hamming gate: the shared perceptual-hash
    // core (pigeonhole completeness + star-pair skew guard live there)
    val hammingPairs = HammingLsh.bandedPairs(hashed, "dhash", maxDist, bands, maxBucketSize)

    val side = hashed.select(col("id"), col("thumb"),
      aggregate(col("thumb"), lit(0L), (a, x) => a + x).as("tsum"))
    val verified = hammingPairs
      .join(side.select(col("id").as("id_a"),
        col("thumb").as("t_a"), col("tsum").as("s_a")), Seq("id_a"))
      .join(side.select(col("id").as("id_b"),
        col("thumb").as("t_b"), col("tsum").as("s_b")), Seq("id_b"))

    val pixOk =
      if (pixTol < 0) verified
      else verified.filter(
        // max_i |72·t_a(i) − s_a − (72·t_b(i) − s_b)| ≤ 72·pixTol: the
        // mean-centered comparison in sum-scaled integers (72 = pixels
        // per thumb), exact — no float means
        aggregate(
          zip_with(col("t_a"), col("t_b"), (a, b) =>
            abs(a.cast("long") * lit(72L) - col("s_a") - b.cast("long") * lit(72L) + col("s_b"))),
          lit(0L), (acc, x) => greatest(acc, x)) <= lit(72L * pixTol))

    pixOk.select(col("id_a"), col("id_b"), col("hamming"))
  }
}
