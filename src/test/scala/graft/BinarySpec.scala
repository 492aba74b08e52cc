package graft

import graft.functions.BinaryKernels
import graft.knn.{Knn, Quantize}
import org.apache.spark.sql.functions._

/** 1-bit binary quantization: pack/hamming kernel agreement between the
  * Catalyst expressions and the JVM-side functions, degeneration to exact
  * brute force at full overscan, recall on clustered geometry, and layout
  * invariance.
  */
class BinarySpec extends SparkTestBase {
  import spark.implicits._

  private def unit(x: Long): Double = graft.core.SplitMix.unit(graft.core.SplitMix.mix(x))

  private def vectors(n: Int, dim: Int): Seq[(Long, Array[Float])] =
    (0L until n.toLong).map { i =>
      (i, Array.tabulate(dim)(d => (unit(i * 131L + d) - 0.5).toFloat))
    }

  private def clustered(n: Int, nClusters: Int, dim: Int, sigma: Double): Seq[(Long, Array[Float])] =
    (0L until n.toLong).map { i =>
      val c = (i % nClusters).toInt
      val v = Array.tabulate(dim) { d =>
        val center = unit(c.toLong * 1000003L + d)
        val noise = (unit(i * 31L + d.toLong * 7L + 1L) - 0.5) * 2 * sigma
        (center + noise).toFloat
      }
      (i, v)
    }

  test("expression pack/hamming match the JVM kernels bit-for-bit") {
    val data = vectors(64, 70) // dim 70: exercises the partial last word
    val thr = Quantize.binaryThresholds(data.toDF("id", "vector"))
    assert(thr.length === 70)
    val df = Quantize.binarize(data.toDF("id", "vector"), thr)
    val q = data.head._2
    val qSig = BinaryKernels.pack(q, thr)
    val rows = df.select(col("id"), col("sig"),
        graft.functions.vec.hammingWords(col("sig"), lit(qSig)).as("hd"))
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val sig = r.getSeq[Long](1).toArray
      val expected = BinaryKernels.pack(data(id.toInt)._2, thr)
      assert(sig.toSeq === expected.toSeq, s"sig mismatch at id $id")
      assert(r.getInt(2) === BinaryKernels.hamming(expected, qSig))
    }
  }

  test("full overscan degenerates to exact brute force, row for row") {
    val data = vectors(300, 32)
    val df = data.toDF("id", "vector")
    val thr = Quantize.binaryThresholds(df)
    val queries = data.take(4).toArray
    val exact = Knn.bruteForce(df, queries.toSeq.toDF("qid", "qvec"), 10)
      .select("qid", "id", "dist", "rank").orderBy("qid", "rank").collect().toSeq
    val bin = Quantize.searchBinary(spark, df, thr, queries, 10, overscan = 30)
      .select("qid", "id", "dist", "rank").orderBy("qid", "rank").collect().toSeq
    assert(bin === exact)
  }

  test("clustered-geometry recall at modest overscan") {
    val data = clustered(4000, 40, 64, sigma = 0.05)
    val df = data.toDF("id", "vector").repartition(8)
    val thr = Quantize.binaryThresholds(df)
    val queries = data.take(10).toArray
    val k = 10
    val exact = Knn.bruteForce(df, queries.toSeq.toDF("qid", "qvec"), k)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bin = Quantize.searchBinary(spark, df, thr, queries, k, overscan = 8)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & bin).size.toDouble / exact.size
    assert(recall >= 0.9, s"binary-sketch recall $recall < 0.9 on clustered geometry")
  }

  test("searchBinary is invariant to partition layout") {
    val data = vectors(500, 48)
    val thr = Quantize.binaryThresholds(data.toDF("id", "vector"))
    val queries = data.take(3).toArray
    def run(parts: Int) =
      Quantize.searchBinary(spark, data.toDF("id", "vector").repartition(parts), thr,
          queries, 5, overscan = 6)
        .select(col("qid"), col("id"), round(col("dist"), 4).as("dist"), col("rank"))
        .orderBy("qid", "rank").collect().toSeq
    assert(run(3) === run(11))
  }

  test("IVF×binary composes: full probe+overscan equals brute force; probed recall holds") {
    import graft.knn.Ivf
    val data = clustered(3000, 30, 32, sigma = 0.05)
    val df = data.toDF("id", "vector").repartition(6)
    val centroids = Ivf.train(spark, df, c = 16, iterations = 2)
    val assigned = Ivf.assign(spark, df, centroids)
    val thr = Quantize.binaryThresholds(df)
    val queries = data.take(6).toArray
    val exact = Knn.bruteForce(df, queries.toSeq.toDF("qid", "qvec"), 10)
      .select("qid", "id", "dist", "rank").orderBy("qid", "rank").collect().toSeq
    val full = Quantize.searchIvfBinary(spark, assigned, centroids, thr, queries, 10,
        nprobe = 16, overscan = 300)
      .select("qid", "id", "dist", "rank").orderBy("qid", "rank").collect().toSeq
    assert(full === exact)
    val probed = Quantize.searchIvfBinary(spark, assigned, centroids, thr, queries, 10,
        nprobe = 4, overscan = 8)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactSet & probed).size.toDouble / exactSet.size
    assert(recall >= 0.85, s"IVF×binary recall $recall < 0.85 on clustered geometry")
  }

  test("thresholds reject ragged vectors; pack rejects dim mismatch") {
    intercept[Exception] {
      Quantize.binaryThresholds(
        Seq((0L, Array(1f, 2f)), (1L, Array(1f, 2f, 3f))).toDF("id", "vector"))
    }
    intercept[Exception] {
      BinaryKernels.pack(Array(1f, 2f), Array(0f))
    }
  }
}
