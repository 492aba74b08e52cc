package graft

import org.apache.spark.sql.functions._

/** SQ4 (4-bit) tier: the packed-nibble encode kernel pinned against an
  * independent scalar reference, the reconstruction contract (q_err /
  * q_err_l1 are true upper bounds, codes halve the SQ8 footprint), and
  * the property the tier exists for — searchExact(codec = "sq4") returns
  * EXACTLY the brute-force top-k on any data, for both τ metrics, and
  * composes with IVF probing unchanged.
  */
class Sq4EncodeSpec extends SparkTestBase {

  /** Independent scalar reference of the documented arithmetic. */
  private def refEncode(v: Array[Float]): (Array[Byte], Float, Float, Double, Double) = {
    val mn = v.min
    val mx = v.max
    val scale = (mx - mn) / 15f
    val packed = new Array[Byte]((v.length + 1) / 2)
    var e2 = 0.0
    var e1 = 0.0
    v.indices.foreach { i =>
      val code =
        if (scale == 0f) 0
        else BigDecimal.decimal((v(i) - mn) / scale)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt
      if ((i & 1) == 0) packed(i >> 1) = code.toByte
      else packed(i >> 1) = (packed(i >> 1) | (code << 4)).toByte
      val d = v(i).toDouble - ((code.toFloat * scale) + mn).toDouble
      e2 += d * d
      e1 += math.abs(d)
    }
    (packed, scale, mn, math.sqrt(e2) * (1.0 + 1e-9) + 1e-12, e1 * (1.0 + 1e-9) + 1e-12)
  }

  test("sq4 kernel matches the scalar reference on real embeddings and edge shapes") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<float>").as("vector"))
      .as[(Long, Array[Float])].collect().toSeq
    val edge: Seq[(Long, Array[Float])] = Seq(
      -1L -> Array.fill(64)(3.25f),            // constant → scale 0
      -2L -> Array(1e-30f, -1e-30f, 0f),
      -3L -> Array(-5f, 5f),
      -4L -> Array(42f),                       // single element (odd dim)
      -5L -> Array.tabulate(7)(i => i * 1.5f)) // odd dim > 1
    val rows = emb ++ edge
    val out = graft.knn.Quantize.sq4(rows.toDF("id", "vector"))
      .select("id", "codes", "q_scale", "q_offset", "q_err", "q_err_l1", "q_dim")
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Byte](1).toArray, r.getFloat(2), r.getFloat(3),
          r.getDouble(4), r.getDouble(5), r.getInt(6))).toMap
    rows.foreach { case (id, v) =>
      val (codes, scale, off, e2, e1, dim) = out(id)
      val (rc, rs, ro, re2, re1) = refEncode(v)
      assert(codes.toSeq === rc.toSeq, s"codes diverge for id=$id")
      assert(scale === rs && off === ro, s"scale/offset diverge for id=$id")
      assert(e2 === re2 && e1 === re1, s"errors diverge for id=$id")
      assert(dim === v.length)
      assert(codes.length === (v.length + 1) / 2, "2 codes per byte")
    }
  }

  test("decode round-trip: per-dim error <= scale/2 (+rounding), q_err bounds hold") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(50)(i => (i.toLong, Array.fill(33)(rnd.nextFloat() * 20f - 10f)))
    val out = graft.knn.Quantize.sq4(rows.toDF("id", "vector"))
      .select("id", "codes", "q_scale", "q_offset", "q_err", "q_err_l1", "q_dim")
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Byte](1).toArray, r.getFloat(2), r.getFloat(3),
          r.getDouble(4), r.getDouble(5), r.getInt(6))).toMap
    rows.foreach { case (id, v) =>
      val (codes, scale, off, e2, e1, dim) = out(id)
      val vhat = graft.functions.Sq4Encode.dequantize(codes, dim, scale, off)
      var te2 = 0.0
      var te1 = 0.0
      v.indices.foreach { i =>
        val d = v(i).toDouble - vhat(i).toDouble
        assert(math.abs(d) <= scale / 2.0 + 1e-4,
          s"dim $i of id=$id off by $d > scale/2 = ${scale / 2}")
        te2 += d * d
        te1 += math.abs(d)
      }
      assert(math.sqrt(te2) <= e2, s"q_err not an upper bound for id=$id")
      assert(te1 <= e1, s"q_err_l1 not an upper bound for id=$id")
    }
  }

  test("searchExact codec=sq4 equals brute force exactly (euclidean and manhattan)") {
    val data = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<float>").as("vector"))
    import spark.implicits._
    val queries = data.filter(col("id") < 4).as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, v) }.sortBy(_._1)
    val q4 = graft.knn.Quantize.sq4(data)
    Seq("euclidean", "manhattan").foreach { metric =>
      val got = graft.knn.Quantize.searchExact(spark, q4, queries, k = 7,
          metric = metric, codec = "sq4")
        .select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._3))
      val qdf = queries.toSeq.toDF("qid", "qvec")
      val exact = graft.knn.Knn.bruteForce(data, qdf, 7, metric)
        .select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._3))
      assert(got.toSeq === exact.toSeq, s"sq4 τ-search diverged from brute force at $metric")
    }
  }

  test("IVF×SQ4 equals full-precision IVF at the same nprobe, row for row") {
    val data = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<float>").as("vector"))
    import spark.implicits._
    val queries = data.filter(col("id") < 3).as[(Long, Array[Float])].collect().sortBy(_._1)
    val centroids = graft.knn.Ivf.train(spark, data, c = 8, iterations = 1)
    val assigned = graft.knn.Ivf.assign(spark, data, centroids).cache()
    val q4 = graft.knn.Quantize.sq4(assigned)
    val sq = graft.knn.Quantize.searchIvfSq4(spark, q4, centroids, queries, k = 5, nprobe = 3)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._3))
    val ivf = graft.knn.Ivf.search(spark, assigned, centroids, queries, k = 5, nprobe = 3)
      .select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._3))
    assert(sq.toSeq === ivf.toSeq)
    assigned.unpersist()
  }
}
