package graft

import graft.knn.Knn
import org.apache.spark.sql.functions._

/** Matryoshka prefix-dimension retrieval: exactness when the coarse stage
  * is saturated, recall when it is not, and prefix-column equivalence.
  */
class MatryoshkaSpec extends SparkTestBase {
  import spark.implicits._

  private def unit(x: Long): Double = graft.core.SplitMix.unit(graft.core.SplitMix.mix(x))

  // MRL-like geometry: information front-loaded into the prefix — cluster
  // identity lives in dims 0..15, dims 16..63 carry small noise
  private val dim = 64
  private val nVecs = 400
  private val nClusters = 8
  private lazy val vectors: Seq[(Long, Array[Float])] = (0 until nVecs).map { i =>
    val c = i % nClusters
    val v = Array.tabulate(dim) { e =>
      val center = if (e < 16) unit(c.toLong * 1000003L + e) * 4.0 else 0.0
      val noise = (unit(i.toLong * 131L + e) - 0.5) * 0.2
      (center + noise).toFloat
    }
    (i.toLong, v)
  }
  private lazy val data = vectors.toDF("id", "vector").cache()
  private lazy val queries = vectors.take(5).map { case (id, v) => (id, v) }
    .toDF("qid", "qvec")

  test("saturated coarseK equals bruteForce row-for-row") {
    val exact = Knn.bruteForce(data, queries, 10)
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect().sorted
    val mrl = Knn.matryoshka(data, queries, k = 10, dPrefix = 16, coarseK = nVecs)
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect().sorted
    assert(mrl === exact) // identical kernel + tie-break -> bit-equal dists
  }

  test("prefix coarse stage keeps high recall on front-loaded geometry") {
    val exact = Knn.bruteForce(data, queries, 10).select("qid", "id")
    val mrl = Knn.matryoshka(data, queries, k = 10, dPrefix = 16, coarseK = 40)
      .select("qid", "id")
    val hits = mrl.join(exact, Seq("qid", "id"), "left_semi").count()
    val recall = hits.toDouble / (5 * 10)
    assert(recall >= 0.9, s"matryoshka recall $recall < 0.9")
  }

  test("materialized prefix column gives the identical result to inline slice") {
    val withPrefix = data.withColumn("vp16", slice(col("vector"), 1, 16))
    val inline = Knn.matryoshka(data, queries, k = 10, dPrefix = 16, coarseK = 40)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sorted
    val mat = Knn.matryoshka(withPrefix, queries, k = 10, dPrefix = 16, coarseK = 40,
        prefixCol = Some("vp16"))
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sorted
    assert(mat === inline)
  }

  test("coarseK below k is rejected") {
    intercept[IllegalArgumentException](
      Knn.matryoshka(data, queries, k = 10, dPrefix = 16, coarseK = 5))
  }

  test("IVF composition: saturated arms equal bruteForce; probed arm keeps recall") {
    val queryArr = vectors.take(5).map { case (id, v) => (id, v) }.toArray
    val centroids = graft.knn.Ivf.train(spark, data, c = 8, iterations = 2)
    val assigned = graft.knn.Ivf.assign(spark, data, centroids)
    val exact = Knn.bruteForce(data, queries, 10)
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect().sorted
    // full probe + saturated coarseK: both pruning levers degenerate
    val full = Knn.matryoshkaIvf(spark, assigned, centroids, queryArr, k = 10,
        nprobe = 8, dPrefix = 16, coarseK = nVecs)
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect().sorted
    assert(full === exact)
    // probed arm on the front-loaded clustered geometry
    val probed = Knn.matryoshkaIvf(spark, assigned, centroids, queryArr, k = 10,
      nprobe = 3, dPrefix = 16, coarseK = 40).select("qid", "id")
    val hits = probed.join(Knn.bruteForce(data, queries, 10).select("qid", "id"),
      Seq("qid", "id"), "left_semi").count()
    assert(hits.toDouble / 50 >= 0.9, s"ivf-matryoshka recall ${hits / 50.0} < 0.9")
  }

  test("IVF composition DF query side equals the array path row-for-row") {
    val queryArr = vectors.take(5).map { case (id, v) => (id, v) }.toArray
    val centroids = graft.knn.Ivf.train(spark, data, c = 8, iterations = 2)
    val assigned = graft.knn.Ivf.assign(spark, data, centroids)
    val arr = Knn.matryoshkaIvf(spark, assigned, centroids, queryArr, k = 10,
        nprobe = 3, dPrefix = 16, coarseK = 40)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sorted
    val df = Knn.matryoshkaIvfDF(assigned, centroids, queries, k = 10,
        nprobe = 3, dPrefix = 16, coarseK = 40)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sorted
    assert(df === arr)
    // and with a spilled assignment + dedup
    val spilled = graft.knn.Ivf.assign(spark, data, centroids, spill = 2)
    val arrS = Knn.matryoshkaIvf(spark, spilled, centroids, queryArr, k = 10,
        nprobe = 3, dPrefix = 16, coarseK = 40, dedup = true)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sorted
    val dfS = Knn.matryoshkaIvfDF(spilled, centroids, queries, k = 10,
        nprobe = 3, dPrefix = 16, coarseK = 40, dedup = true)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sorted
    assert(dfS === arrS)
  }

  test("IVF composition: spilled assignment with dedup never duplicates a rank slot") {
    val queryArr = vectors.take(3).map { case (id, v) => (id, v) }.toArray
    val centroids = graft.knn.Ivf.train(spark, data, c = 8, iterations = 2)
    val spilled = graft.knn.Ivf.assign(spark, data, centroids, spill = 2)
    val res = Knn.matryoshkaIvf(spark, spilled, centroids, queryArr, k = 10,
        nprobe = 8, dPrefix = 16, coarseK = nVecs, dedup = true)
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect()
    // no (qid, id) appears twice, and the saturated arms stay exact
    assert(res.map(r => (r._1, r._2)).distinct.length === res.length)
    val queries3 = vectors.take(3).map { case (id, v) => (id, v) }.toDF("qid", "qvec")
    val exact = Knn.bruteForce(data, queries3, 10)
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect().sorted
    assert(res.sorted === exact)
  }

  test("matryoshkaDF equals the broadcast array path row-for-row (incl. multi-block)") {
    val arr = Knn.matryoshka(data, queries, k = 10, dPrefix = 16, coarseK = 60)
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect().sorted
    val df = Knn.matryoshkaDF(data, queries, k = 10, dPrefix = 16, coarseK = 60)
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect().sorted
    assert(df === arr)
    // queryBlock = 2 forces the blocked re-scan path; same per-query heaps
    val blocked = Knn.matryoshkaDF(data, queries, k = 10, dPrefix = 16, coarseK = 60,
        queryBlock = 2)
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect().sorted
    assert(blocked === arr)
    // and with a materialized prefix column on the coarse scan
    val withP = data.withColumn("vp16", slice(col("vector"), 1, 16))
    val mat = Knn.matryoshkaDF(withP, queries, k = 10, dPrefix = 16, coarseK = 60,
        prefixCol = Some("vp16"))
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect().sorted
    assert(mat === arr)
  }

  test("mismatched materialized prefix column fails loudly instead of truncating") {
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    val bad = data.withColumn("vp8", slice(col("vector"), 1, 8)) // 8 != dPrefix 16
    val e = intercept[Exception] {
      Knn.matryoshka(bad, queries, k = 5, dPrefix = 16, coarseK = 50,
        prefixCol = Some("vp8")).collect()
    }
    assert(msgs(e).contains("prefix column"), msgs(e))
    val centroids = graft.knn.Ivf.train(spark, bad.select("id", "vector"), c = 8, iterations = 1)
    val assigned = graft.knn.Ivf.assign(spark, bad.select("id", "vector"), centroids)
      .join(bad.select(col("id"), col("vp8")), Seq("id"))
    val queryArr = vectors.take(3).map { case (id, v) => (id, v) }.toArray
    val e2 = intercept[Exception] {
      Knn.matryoshkaIvf(spark, assigned, centroids, queryArr, k = 5,
        nprobe = 8, dPrefix = 16, coarseK = 50, prefixCol = Some("vp8")).collect()
    }
    assert(msgs(e2).contains("prefix column"), msgs(e2))
    val e3 = intercept[Exception] {
      Knn.matryoshkaDF(bad, queries, k = 5, dPrefix = 16, coarseK = 50,
        prefixCol = Some("vp8")).collect()
    }
    assert(msgs(e3).contains("prefix column"), msgs(e3))
  }
}
