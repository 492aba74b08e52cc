package graft

import graft.knn.Pca
import org.apache.spark.sql.functions._

/** PCA invariants: orthonormal descending spectrum, trace conservation,
  * full-rank isometry + round-trip, truncation's residual-variance identity,
  * planted-subspace recovery, layout invariance, loud degenerate failures.
  */
class PcaSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<float>").as("vector"))
  private lazy val model = Pca.fit(emb, "vector", 64)

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("components are orthonormal, eigenvalues descending, trace conserved") {
    val p = model.components
    for (i <- p.indices; j <- i until p.length) {
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot(p(i), p(j)) - expect) < 1e-9, s"P·Pᵀ[$i][$j]")
    }
    assert(model.eigenvalues.sliding(2).forall(w => w(0) >= w(1) - 1e-12))
    assert(math.abs(model.eigenvalues.sum - model.covTrace) < 1e-9 * math.max(1.0, model.covTrace))
  }

  test("full-rank projection is an isometry and round-trips") {
    val proj = emb.limit(100)
      .withColumn("rot", Pca.projectCol(model, col("vector")))
      .withColumn("back", Pca.reconstructCol(model, col("rot")))
    val a = proj.as("a")
    val b = broadcast(proj.as("b"))
    val isoBad = a.join(b, $"a.vec_id" < $"b.vec_id")
      .filter(abs(
        graft.functions.vec.distEuclidean($"a.vector", $"b.vector") -
          graft.functions.vec.distEuclidean($"a.rot", $"b.rot")) > 1e-3)
      .count()
    assert(isoBad == 0)
    val roundTripBad = proj
      .filter(aggregate(zip_with(col("vector"), col("back"),
        (x, y) => abs(x - y)), lit(0.0d), (acc, d) => greatest(acc, d)) > 1e-3)
      .count()
    assert(roundTripBad == 0)
  }

  test("truncated reconstruction error equals the residual eigenvalue sum") {
    val m8 = model.truncate(8)
    val err = emb
      .withColumn("back", Pca.reconstructCol(m8, Pca.projectCol(m8, col("vector"))))
      .select(avg(aggregate(zip_with(col("vector"), col("back"),
        (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, d) => acc + d)).as("mse"))
      .head().getDouble(0)
    val expected = model.residualVariance(8)
    assert(math.abs(err - expected) < 1e-4 * math.max(1.0, expected),
      s"mse $err vs residual variance $expected")
  }

  test("planted rank-3 data: top-3 components explain >99.9% of variance") {
    val dim = 16
    val planted = spark.range(600).map { id =>
      val c1 = (graft.core.SplitMix.unit(id * 3) - 0.5) * 6.0
      val c2 = (graft.core.SplitMix.unit(id * 3 + 1) - 0.5) * 4.0
      val c3 = (graft.core.SplitMix.unit(id * 3 + 2) - 0.5) * 2.0
      Array.tabulate(dim) { i =>
        val d1 = 0.25
        val d2 = if (i % 2 == 0) 0.25 else -0.25
        val d3 = if ((i / 2) % 2 == 0) 0.25 else -0.25
        val noise = (graft.core.SplitMix.unit(id * 100 + i) - 0.5) * 2e-3
        (c1 * d1 + c2 * d2 + c3 * d3 + noise).toFloat
      }
    }.toDF("vector")
    val pm = Pca.fit(planted, "vector", 3)
    assert(pm.explainedVariance(3) > 0.999, s"explained ${pm.explainedVariance(3)}")
    assert(pm.explainedVariance(2) < 0.999)
  }

  test("layout-invariant to numerical tolerance") {
    val m3 = Pca.fit(emb.repartition(3), "vector", 4)
    val m7 = Pca.fit(emb.repartition(7), "vector", 4)
    m3.eigenvalues.zip(m7.eigenvalues).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-6 * math.max(1.0, math.abs(x)))
    }
    m3.components.zip(m7.components).foreach { case (u, w) =>
      assert(math.abs(math.abs(dot(u, w)) - 1.0) < 1e-6)
    }
  }

  test("searchExact through a truncated projection equals brute-force kNN row-for-row") {
    val data = emb.select(col("vec_id").as("id"), col("vector"))
    val queries = data.filter(col("id") < 7).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val m8 = Pca.fit(data, "vector", 8)
    val projected = Pca.projectWithResidual(data, m8)
    val got = Pca.searchExact(spark, projected, m8, queries, k = 12)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(x => (x._1, x._3))
    val want = graft.knn.Knn.bruteForce(data,
        emb.filter(col("vec_id") < 7).select(col("vec_id").as("qid"), col("vector").as("qvec")),
        12, "euclidean")
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(x => (x._1, x._3))
    assert(got.toSeq == want.toSeq)
  }

  test("residual norms satisfy the Pythagorean identity") {
    val m8 = model.truncate(8)
    val bad = Pca.projectWithResidual(emb, m8)
      .withColumn("back", Pca.reconstructCol(m8, col("proj")))
      .withColumn("true_r", sqrt(aggregate(zip_with(col("vector"), col("back"),
        (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, d) => acc + d)))
      .filter(abs(col("presidual") - col("true_r")) > 1e-3)
      .count()
    assert(bad == 0)
  }

  test("degenerate inputs fail loudly") {
    intercept[IllegalArgumentException](Pca.fit(emb.limit(0), "vector", 4))
    intercept[IllegalArgumentException](Pca.fit(emb, "vector", 0))
    intercept[IllegalArgumentException](Pca.fit(emb, "vector", 65))
    intercept[IllegalArgumentException](model.truncate(0))
    val mixed = emb.limit(5).select(col("vec_id"), col("vector"))
      .union(Seq((9999L, Array(1f, 2f))).toDF("vec_id", "vector"))
    assertThrows[Exception](Pca.fit(mixed, "vector", 2))
  }
}
