package graft

import graft.hnsw.{HnswConfig, HnswSpark}
import graft.knn.{Ivf, Knn}
import org.apache.spark.sql.functions._

/** Recall validation on CLUSTERED (non-uniform) corpora — the geometry real
  * embedding corpora have. The parquet testdata embeddings are ~uniform,
  * which is the ADVERSARIAL case for balanced IVF cells (neighbors spread
  * across cell boundaries — documented at the ann_ivf catalog entry); these
  * tests plant Gaussian-ish clusters deterministically (id-seeded
  * splitmix64 noise, no RNG state) and hold IVF and HNSW to the recall
  * floors a realistic geometry must clear (reference gate:
  * `index/hnsw_test.go:21-75` scores search against brute force).
  */
class ClusteredRecallSpec extends SparkTestBase {
  import spark.implicits._

  private def unit(x: Long): Double = graft.core.SplitMix.unit(graft.core.SplitMix.mix(x))

  /** n points in nClusters well-separated clusters in [0,1)^dim: center
    * coordinates are splitmix64 of (cluster, dim), points add +-sigma
    * uniform noise seeded by (id, dim). Everything is a pure function of
    * ids — deterministic across runs and partition layouts.
    */
  private def clustered(
      n: Int, nClusters: Int, dim: Int, sigma: Double): Seq[(Long, Array[Float])] =
    (0L until n.toLong).map { i =>
      val c = (i % nClusters).toInt
      val v = Array.tabulate(dim) { d =>
        val center = unit(c.toLong * 1000003L + d)
        val noise = (unit(i * 31L + d.toLong * 7L + 1L) - 0.5) * 2 * sigma
        (center + noise).toFloat
      }
      (i, v)
    }

  private def recallOf(
      approx: org.apache.spark.sql.DataFrame,
      exact: org.apache.spark.sql.DataFrame,
      nQueries: Int, k: Int): Double = {
    val hits = approx.select(col("qid"), col("id"))
      .join(exact.select(col("qid"), col("id")), Seq("qid", "id"), "left_semi")
      .count()
    hits.toDouble / (nQueries.toLong * k)
  }

  private lazy val points = clustered(n = 4000, nClusters = 25, dim = 16, sigma = 0.05)
  private lazy val data = points.toDF("id", "vector").repartition(8, col("id")).cache()
  // queries from inside the clusters (every 167th point) — the serving shape
  private lazy val queryPairs = points.filter(_._1 % 167 == 0).toArray
  private lazy val queriesDf = queryPairs.toSeq.toDF("qid", "qvec")
  private lazy val exactDf =
    Knn.bruteForce(data, queriesDf, 10, "euclidean").select("qid", "id").cache()

  test("IVF on clustered corpus: small probe fraction reaches high recall (spill=1,2)") {
    val c = 25
    val centroids = Ivf.train(spark, data, c, iterations = 3, seeding = "kmeans||")
    val nq = queryPairs.length
    // nprobe=2 of 25 cells = 8% probe fraction
    val r1 = recallOf(
      Ivf.search(spark, Ivf.assign(spark, data, centroids), centroids,
        queryPairs, k = 10, nprobe = 2),
      exactDf, nq, 10)
    val r2 = recallOf(
      Ivf.search(spark, Ivf.assign(spark, data, centroids, spill = 2), centroids,
        queryPairs, k = 10, nprobe = 2, dedup = true),
      exactDf, nq, 10)
    // clustered geometry is what IVF is FOR: a query's neighbors live in
    // its own (plus at most one adjacent) cell
    assert(r1 >= 0.85, s"spill=1 nprobe=2 recall $r1 < 0.85 on clustered corpus")
    assert(r2 >= 0.95, s"spill=2 nprobe=2 recall $r2 < 0.95 on clustered corpus")
    assert(r2 >= r1, s"spill=2 recall $r2 below spill=1 recall $r1")
  }

  test("IVF mini-batch train (sampleFraction) holds the clustered recall floor") {
    val c = 25
    // 25% deterministic md5 sample = ~40 train vectors per cluster — the
    // k-means estimator stays well-conditioned, so the sampled centroids
    // must clear the same serving floor as the full train
    val centroids = Ivf.train(spark, data, c, iterations = 3, seeding = "kmeans||",
      sampleFraction = 0.25)
    assert(centroids.length == c)
    val r = recallOf(
      Ivf.search(spark, Ivf.assign(spark, data, centroids), centroids,
        queryPairs, k = 10, nprobe = 2),
      exactDf, queryPairs.length, 10)
    assert(r >= 0.85, s"sampled-train nprobe=2 recall $r < 0.85 on clustered corpus")
    // determinism: the sample is a pure function of (id, seed) — a second
    // train over a different partition layout must reproduce the centroids
    val again = Ivf.train(spark, data.repartition(3, col("id")), c, iterations = 3,
      seeding = "kmeans||", sampleFraction = 0.25)
    assert(centroids.zip(again).forall { case (a, b) => a.sameElements(b) },
      "sampled train not layout-independent")
  }

  test("HNSW on clustered corpus: recall >= 0.9 (reference hnsw_test.go gate)") {
    val approx = HnswSpark.search(spark, data, queryPairs, k = 10, "euclidean",
      HnswConfig(ef = 100), numPartitions = 4)
    val r = recallOf(approx, exactDf, queryPairs.length, 10)
    assert(r >= 0.9, s"HNSW recall $r < 0.9 on clustered corpus")
  }

  test("IVF×SQ8 on clustered corpus matches full-precision IVF at small nprobe") {
    val c = 25
    val centroids = Ivf.train(spark, data, c, iterations = 3, seeding = "kmeans||")
    val assigned = Ivf.assign(spark, data, centroids).cache()
    val q8 = graft.knn.Quantize.sq8(assigned)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(x => (x._1, x._3)).toSeq
    val sq = rows(graft.knn.Quantize.searchIvfSq8(spark, q8, centroids, queryPairs, k = 10, nprobe = 2))
    val fp = rows(Ivf.search(spark, assigned, centroids, queryPairs, k = 10, nprobe = 2))
    assert(sq === fp, "SQ8-within-probed-cells diverged from full-precision IVF on clustered data")
    assigned.unpersist()
  }

  test("IVFADC on clustered corpus: residual recall >= 0.9 and >= raw PQ at the same budget") {
    val c = 25
    val centroids = Ivf.train(spark, data, c, iterations = 3, seeding = "kmeans||")
    val assigned = Ivf.assign(spark, data, centroids).cache()
    val nq = queryPairs.length
    val cbRaw = graft.knn.Pq.train(spark, data, m = 8, ksub = 32, iterations = 2)
    val cbRes = graft.knn.Pq.trainResidual(spark, assigned, centroids, m = 8, ksub = 32, iterations = 2)
    val rRaw = recallOf(
      graft.knn.Pq.searchIvfPq(spark, graft.knn.Pq.encode(assigned, cbRaw),
        centroids, cbRaw, queryPairs, k = 10, nprobe = 2, overscan = 8),
      exactDf, nq, 10)
    val rRes = recallOf(
      graft.knn.Pq.searchIvfPqResidual(spark, graft.knn.Pq.encodeResidual(assigned, centroids, cbRes),
        centroids, cbRes, queryPairs, k = 10, nprobe = 2, overscan = 8),
      exactDf, nq, 10)
    // residual codes resolve WITHIN-cluster structure: on clustered
    // geometry (where cells ≈ clusters and raw codes mostly encode which
    // cluster a point is in) the residual advantage is at its largest
    assert(rRes >= 0.9, s"IVFADC recall $rRes < 0.9 on clustered corpus")
    assert(rRes >= rRaw, s"residual recall $rRes below raw-PQ recall $rRaw at the same byte budget")
    assigned.unpersist()
  }

  test("probe autotuning: tuned nprobe meets the target, tuned-1 misses it, and the " +
      "clustered geometry keeps it far below full probe") {
    val c = 25
    val centroids = Ivf.train(spark, data, c, iterations = 3, seeding = "kmeans||")
    val assigned = Ivf.assign(spark, data, centroids).cache()
    val nq = queryPairs.length
    val perQ = Ivf.tuneProbe(spark, assigned, centroids, queryPairs, k = 10, targetRecall = 1.0)
    assert(perQ.count() === nq.toLong)
    val tuned = Ivf.tuneProbeGlobal(perQ)
    assert(tuned >= 1 && tuned < c, s"tuned nprobe $tuned not in [1, $c) — clustered " +
      "geometry should never need full probe")
    val rAt = recallOf(
      Ivf.search(spark, assigned, centroids, queryPairs, k = 10, nprobe = tuned), exactDf, nq, 10)
    assert(rAt === 1.0, s"recall $rAt < 1.0 at tuned nprobe $tuned")
    if (tuned > 1) {
      val rBelow = recallOf(
        Ivf.search(spark, assigned, centroids, queryPairs, k = 10, nprobe = tuned - 1),
        exactDf, nq, 10)
      assert(rBelow < 1.0, s"recall still 1.0 at nprobe ${tuned - 1} — tuned value not minimal")
    }
    // the relaxed quantile can only lower the serving nprobe
    assert(Ivf.tuneProbeGlobal(perQ, quantile = 0.5) <= tuned)
    assigned.unpersist()
  }
}
