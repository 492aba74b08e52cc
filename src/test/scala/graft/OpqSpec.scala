package graft

import graft.knn.{Ivf, Knn, Opq, Pq}
import org.apache.spark.sql.functions._

/** Parametric OPQ invariants: rotation orthonormality + isometry, balanced
  * eigenvalue allocation, strictly-lower reconstruction MSE than
  * storage-order PQ on an anisotropic spectrum, search recall through the
  * rotated IVF×PQ stack, save/load self-description (incl. the fail-loud
  * raw-query guard).
  */
class OpqSpec extends SparkTestBase {

  import spark.implicits._

  /** Deterministic anisotropic corpus: dim 16, variance of dimension i
    * decays as 2^(−i) in STORAGE order — the configuration where the
    * natural slices [0..3],[4..7],… hand the first codebook nearly all
    * the variance (log₂ products −6, −22, −38, −54) while the allocation
    * can rebalance to −30 each, the regime where the rotation provably
    * helps (Ge et al. 2013 Fig. 4's anisotropic case).
    */
  private lazy val aniso = {
    val dim = 16
    (0 until 4000).map { id =>
      val rnd = new graft.core.SplitMix.Stream(id.toLong * 7919 + 13)
      def gaussian(): Double = {
        val u1 = 1.0 - rnd.nextUnit()
        val u2 = rnd.nextUnit()
        math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
      }
      val v = new Array[Float](dim)
      var r = 0
      while (r < dim) {
        val sd = math.pow(2.0, -r / 2.0)
        v(r) = (gaussian() * sd).toFloat
        r += 1
      }
      (id.toLong, v)
    }.toDF("id", "vector")
  }

  private lazy val model = Opq.train(aniso, m = 4)

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("rotation is orthonormal and the allocation is balanced") {
    val rot = model.rotation
    for (i <- rot.indices; j <- i until rot.length) {
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot(rot(i), rot(j)) - expect) < 1e-9, s"R·Rᵀ[$i][$j]")
    }
    // every subspace holds exactly dsub components, and the greedy keeps
    // the per-subspace log-variance products within one eigenvalue-log of
    // each other relative to the unbalanced storage-order split
    val lps = (0 until model.m).map(model.subspaceLogVariance)
    val spread = lps.max - lps.min
    // storage-order slices of a 2^-r spectrum differ by ~ sum of 4 log-steps
    // per slice distance; the greedy must do far better than that
    assert(spread < 3.0, s"allocation spread $spread too wide: $lps")
    assert(model.eigenvalues.length == 16 && model.rotation.length == 16)
  }

  test("rotation is an isometry: pairwise distances preserved") {
    val rotated = Opq.rotate(aniso.limit(80), model)
    val orig = aniso.limit(80)
    val joined = orig.as("a").join(broadcast(rotated.as("b")), $"a.id" === $"b.id")
      .select($"a.vector".as("v"), $"b.vector".as("r"))
    val pairs = joined.as("x").join(broadcast(joined.as("y")), expr("true"))
      .filter(abs(
        graft.functions.vec.distEuclidean($"x.v", $"y.v") -
          graft.functions.vec.distEuclidean($"x.r", $"y.r")) > 1e-3)
    assert(pairs.count() == 0)
  }

  test("driver-side query rotation matches the codegen kernel") {
    val qs = aniso.filter(col("id") < 5).as[(Long, Array[Float])].collect().sortBy(_._1)
    val kernel = Opq.rotate(aniso.filter(col("id") < 5), model)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val driver = Opq.rotateQueries(model, qs)
    driver.zip(kernel).foreach { case ((_, d), (_, k)) =>
      d.zip(k).foreach { case (x, y) => assert(math.abs(x - y) < 1e-5f) }
    }
  }

  test("OPQ beats storage-order PQ on reconstruction MSE at equal bytes") {
    val cbRaw = Pq.train(spark, aniso, m = 4, ksub = 16, iterations = 2,
      sampleCap = 2000, seeding = "first")
    val mseRaw = Pq.reconstructionMse(Pq.encode(aniso, cbRaw), cbRaw)

    val rotated = Opq.rotate(aniso, model).cache()
    try {
      val cbOpq = Pq.train(spark, rotated, m = 4, ksub = 16, iterations = 2,
        sampleCap = 2000, seeding = "first")
      val mseOpq = Pq.reconstructionMse(Pq.encode(rotated, cbOpq), cbOpq)
      assert(mseOpq < mseRaw * 0.8,
        s"OPQ mse $mseOpq not materially below raw-PQ mse $mseRaw on anisotropic data")
    } finally rotated.unpersist()
  }

  test("OPQ composes with SQ8's exactness proof: rotated searchExact equals raw top-k") {
    // the τ reconstruction bound is isometry-invariant — quantization
    // error changes under rotation, the exactness guarantee does not, so
    // SQ8 search in rotated coordinates must return the identical top-k
    val queries = aniso.filter(col("id") < 5).as[(Long, Array[Float])].collect().sortBy(_._1)
    val rawQ = graft.knn.Quantize.sq8(aniso)
    val raw = graft.knn.Quantize.searchExact(spark, rawQ, queries, k = 10)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    val rotated = Opq.rotate(aniso, model)
    val rotQ = graft.knn.Quantize.sq8(rotated)
    val rot = graft.knn.Quantize.searchExact(spark, rotQ,
        Opq.rotateQueries(model, queries), k = 10)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(rot.toSeq === raw.toSeq)
  }

  test("rotated IVF×PQ search clears the recall gate; saved index self-describes") {
    val rotated = Opq.rotate(aniso, model).cache()
    try {
      val centroids = Ivf.train(spark, rotated, c = 8, iterations = 1)
      val assigned = Ivf.assign(spark, rotated, centroids)
      val cb = Pq.trainResidual(spark, assigned, centroids, m = 4, ksub = 16,
        iterations = 1, sampleCap = 2000, seeding = "first")
      val encoded = Pq.encodeResidual(assigned, centroids, cb)

      val dir = java.nio.file.Files.createTempDirectory("opq_idx").toString + "/idx"
      Opq.save(spark, encoded, centroids, cb, model, dir, residual = true)

      val queries = aniso.filter(col("id") < 5).as[(Long, Array[Float])]
        .collect().sortBy(_._1)
      val res = Opq.searchSaved(spark, dir, queries, k = 10, nprobe = 8, overscan = 12)
      val exact = Knn.bruteForce(aniso,
        aniso.filter(col("id") < 5).toDF("qid", "qvec"), 10, "euclidean")
      val hits = res.select("qid", "id")
        .join(exact.select("qid", "id"), Seq("qid", "id"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("h")).as[(Long, Long)].collect()
      assert(hits.length == 5 && hits.forall(_._2 >= 8),
        s"rotated IVF×PQ recall below 8/10: ${hits.mkString(",")}")

      // raw-coordinate queries against the rotated index must fail LOUDLY
      val ex = intercept[IllegalArgumentException] {
        Pq.searchSavedIvfPq(spark, dir, queries, k = 10, nprobe = 8)
      }
      assert(ex.getMessage.contains("OPQ rotation sidecar"))

      // the loaded model reproduces the trained one
      val back = Opq.loadModel(spark, dir)
      assert(back.m == model.m && back.dim == model.dim)
      back.rotation.zip(model.rotation).foreach { case (a, b) =>
        a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
      }

      // the DataFrame query side must reproduce the driver-array result
      // ROW-FOR-ROW (same LUT math, same tie-break) and refuse raw paths
      val qDf = aniso.filter(col("id") < 5).toDF("qid", "qvec")
      val dfRes = Opq.searchSavedDF(spark, dir, qDf, k = 10, nprobe = 8, overscan = 12)
        .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
      val arrRes = res.select("qid", "id", "rank").as[(Long, Long, Int)]
        .collect().sortBy(r => (r._1, r._3))
      assert(dfRes.toSeq === arrRes.toSeq)
      val exDf = intercept[IllegalArgumentException] {
        Pq.searchSavedIvfPqDF(spark, dir, qDf, k = 10, nprobe = 8)
      }
      assert(exDf.getMessage.contains("OPQ rotation sidecar"))
    } finally rotated.unpersist()
  }

  test("compose collapses sequential rotations into one original-space model") {
    val m1 = model
    val m2 = Opq.train(Opq.rotate(aniso, m1), m = 4)
    val composed = Opq.compose(m2, m1)
    // still orthonormal (product of orthonormal matrices)
    val dim = composed.dim
    for (i <- 0 until dim; j <- i until dim) {
      val d = dot(composed.rotation(i), composed.rotation(j))
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"RRᵀ[$i][$j] = $d")
    }
    // pointwise identity: composed(v) == m2(m1(v)) — the two-step side
    // rounds to float between stages, so tolerance is float-level
    val sample = aniso.limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val oneShot = Opq.rotateQueries(composed, sample)
    val twoStep = Opq.rotateQueries(m2, Opq.rotateQueries(m1, sample))
    oneShot.zip(twoStep).foreach { case ((_, a), (_, b)) =>
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-4, s"composed $x vs sequential $y")
      }
    }
    // the composed model carries the CURRENT-view spectrum and m
    assert(composed.m === 4)
    assert(composed.eigenvalues.toSeq === m2.eigenvalues.toSeq)
    intercept[IllegalArgumentException] {
      Opq.compose(m2, Opq.OpqModel(new Array[Double](8),
        Array.tabulate(8, 8)((i, j) => if (i == j) 1.0 else 0.0), new Array[Double](8), 4))
    }
  }
}
