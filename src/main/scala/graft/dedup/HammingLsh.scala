package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded-LSH candidate generation + exact verify over ANY 64-bit
  * perceptual hash column — the shared core of the image
  * ([[ImageDedup]]) and audio ([[AudioDedup]]) near-dup tiers.
  *
  * Completeness: the hash splits into `bands` equal slices; two hashes
  * within Hamming distance `maxDist < bands` agree on at least one full
  * slice (pigeonhole), so the (band, slice) equi-join is a complete
  * candidate generator — never an all-pairs product. Candidates then
  * pass an exact 64-bit Hamming gate. Only (id, 8-byte hash) rows
  * shuffle; whatever expensive scan produced the hashes never re-runs
  * here (callers persist it).
  *
  * Skew guard (same trade as [[Dedup.minhashLshPairs]], on by default):
  * a band bucket larger than `maxBucketSize` — a flat thumbnail or
  * silent clip shared by millions of items is a C(n,2) bomb at corpus
  * scale — contributes star pairs against its min-id representative
  * instead of all pairs; exact-duplicate clusters stay connected.
  * `maxBucketSize <= 0` disables.
  *
  * Candidate-density knob: slice width is 64/bands bits, so random-hash
  * candidate volume grows as N²·bands/2^(64/bands). The default
  * (bands = 4, 16-bit slices) serves corpora through the tens of
  * millions (1M items ≈ 27M candidates, all verified by one cheap
  * bit_count gate); at billions of items trade recall radius for
  * density — bands = 2 (32-bit slices) with maxDist ≤ 1 cuts candidate
  * volume by ~2^16 while pigeonhole completeness still holds.
  */
object HammingLsh {

  /** (id_a, id_b, hamming) with id_a < id_b over `hashed` (id long,
    * `hashCol` long).
    */
  def bandedPairs(
      hashed: DataFrame,
      hashCol: String = "dhash",
      maxDist: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 4096): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxDist < bands,
      s"pigeonhole completeness needs maxDist < bands, got maxDist=$maxDist bands=$bands")
    val bandW = 64 / bands
    val mask = if (bandW == 64) -1L else (1L << bandW) - 1L

    val bandRows = hashed.select(
      col("id"),
      posexplode(array((0 until bands).map { b =>
        shiftrightunsigned(col(hashCol), b * bandW).bitwiseAND(lit(mask))
      }: _*)).as(Seq("band", "bh")))

    val candidates = (if (maxBucketSize <= 0) {
      bandRows.alias("l").join(bandRows.alias("r"), Seq("band", "bh"))
        .filter(col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
    } else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
      val sized = bandRows
        .withColumn("__n", count(lit(1)).over(w))
        .withColumn("__min_id", min("id").over(w))
      val small = sized.filter(col("__n") <= maxBucketSize).select("id", "band", "bh")
      val smallPairs = small.alias("l").join(small.alias("r"), Seq("band", "bh"))
        .filter(col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      val starPairs = sized
        .filter(col("__n") > maxBucketSize && col("id") =!= col("__min_id"))
        .select(col("__min_id").as("id_a"), col("id").as("id_b"))
      smallPairs.unionByName(starPairs)
    }).dropDuplicates("id_a", "id_b")

    val side = hashed.select(col("id"), col(hashCol))
    candidates
      .join(side.select(col("id").as("id_a"), col(hashCol).as("__h_a")), Seq("id_a"))
      .join(side.select(col("id").as("id_b"), col(hashCol).as("__h_b")), Seq("id_b"))
      .withColumn("hamming", bit_count(col("__h_a").bitwiseXOR(col("__h_b"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
