package graft

import graft.knn.{Knn, RandomProjection}
import org.apache.spark.sql.functions._

/** JL random-projection tier: matrix determinism, distance preservation
  * within the JL bound, saturated exactness, and recall under the real
  * coarse/rescore composition.
  */
class RandomProjectionSpec extends SparkTestBase {
  import spark.implicits._

  private def unit(x: Long): Double = graft.core.SplitMix.unit(graft.core.SplitMix.mix(x))

  private val dim = 64
  private val nVecs = 300
  private lazy val vectors: Seq[(Long, Array[Float])] = (0 until nVecs).map { i =>
    val c = i % 6
    val v = Array.tabulate(dim) { e =>
      (unit(c.toLong * 7919L + e) * 3.0 + (unit(i.toLong * 131L + e) - 0.5) * 0.3).toFloat
    }
    (i.toLong, v)
  }
  private lazy val data = vectors.toDF("id", "vector").cache()
  private lazy val queries = vectors.take(5).toDF("qid", "qvec")

  test("sign matrix is deterministic, ±1/√dProj, and not constant") {
    val m = RandomProjection.signMatrix(16, 64)
    val m2 = RandomProjection.signMatrix(16, 64)
    assert(m.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq)
    val flat = m.flatten
    assert(flat.forall(v => v == 0.25 || v == -0.25))
    val pos = flat.count(_ > 0)
    assert(pos > flat.length / 4 && pos < 3 * flat.length / 4, s"degenerate sign balance: $pos")
  }

  test("projected pairwise distances stay within the JL distortion band") {
    val proj = data.select(col("id"),
      RandomProjection.projectCol(16, dim, col("vector")).as("vp"))
    val sample = vectors.take(20)
    val projMap = proj.filter(col("id") < 20).as[(Long, Array[Float])].collect().toMap
    def l2(a: Array[Float], b: Array[Float]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum)
    val ratios = for {
      (i, vi) <- sample; (j, vj) <- sample if i < j
    } yield l2(projMap(i), projMap(j)) / l2(vi, vj)
    // dProj=16 is a coarse sketch: expect rough preservation, not tight —
    // the rescore stage is what restores exact ranking
    assert(ratios.forall(r => r > 0.3 && r < 2.0),
      s"distortion outside band: min=${ratios.min} max=${ratios.max}")
  }

  test("saturated coarseK equals bruteForce row-for-row") {
    val exact = Knn.bruteForce(data, queries, 10)
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect().sorted
    val rp = RandomProjection.search(data, queries, k = 10, d = dim, dProj = 16,
        coarseK = nVecs)
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect().sorted
    assert(rp === exact)
  }

  test("coarse top-50 keeps high recall on clustered geometry") {
    val exact = Knn.bruteForce(data, queries, 10).select("qid", "id")
    val rp = RandomProjection.search(data, queries, k = 10, d = dim, dProj = 16,
        coarseK = 50).select("qid", "id")
    val recall = rp.join(exact, Seq("qid", "id"), "left_semi").count().toDouble / 50
    assert(recall >= 0.9, s"JL recall $recall < 0.9")
  }

  test("materialized projection column equals inline projection") {
    val withP = data.withColumn("rp16", RandomProjection.projectCol(16, dim, col("vector")))
    val inline = RandomProjection.search(data, queries, k = 10, d = dim, dProj = 16,
        coarseK = 40).select("qid", "id", "rank").as[(Long, Long, Int)].collect().sorted
    val mat = RandomProjection.search(withP, queries, k = 10, d = dim, dProj = 16,
        coarseK = 40, projCol = Some("rp16"))
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sorted
    assert(mat === inline)
  }

  test("searchDF equals the broadcast path row-for-row (incl. multi-block)") {
    val arr = RandomProjection.search(data, queries, k = 10, d = dim, dProj = 16,
        coarseK = 40)
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect().sorted
    val df = RandomProjection.searchDF(data, queries, k = 10, d = dim, dProj = 16,
        coarseK = 40)
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect().sorted
    assert(df === arr)
    // queryBlock = 2 forces the blocked re-scan path; same per-query heaps
    val blocked = RandomProjection.searchDF(data, queries, k = 10, d = dim, dProj = 16,
        coarseK = 40, queryBlock = 2)
      .select("qid", "id", "dist", "rank").as[(Long, Long, Double, Int)].collect().sorted
    assert(blocked === arr)
  }

  test("mismatched materialized projection column fails loudly instead of truncating") {
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    val bad = data.withColumn("rp8", RandomProjection.projectCol(8, dim, col("vector")))
    val e = intercept[Exception] {
      RandomProjection.search(bad, queries, k = 5, d = dim, dProj = 16,
        coarseK = 40, projCol = Some("rp8")).collect()
    }
    assert(msgs(e).contains("projection column"), msgs(e))
    val e2 = intercept[Exception] {
      RandomProjection.searchDF(bad, queries, k = 5, d = dim, dProj = 16,
        coarseK = 40, projCol = Some("rp8")).collect()
    }
    assert(msgs(e2).contains("projection column"), msgs(e2))
  }
}
