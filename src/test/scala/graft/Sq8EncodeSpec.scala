package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the fused [[graft.functions.Sq8Encode]] kernel bit-for-bit against
  * the composed higher-order-function formulation it replaced (array_min/max
  * + transform(round) codes + two zip_with/aggregate error passes), on real
  * embeddings and on adversarial shapes (constant vectors → scale 0,
  * negatives, tiny magnitudes, single-element). The τ-exactness proof in
  * Quantize.searchExact leans on q_err/q_err_l1 being computed in exactly
  * the documented cast chain — a silent arithmetic drift here would not
  * fail any top-k test until a boundary tie appears, so the equivalence is
  * asserted directly.
  */
class Sq8EncodeSpec extends SparkTestBase {
  import graft.knn.Quantize.dequantize

  /** The pre-kernel HOF formulation, verbatim. */
  private def sq8Hof(data: DataFrame, vectorCol: String = "vector"): DataFrame = {
    val v = col(vectorCol)
    val mn = array_min(v)
    val mx = array_max(v)
    val scale = ((mx - mn) / lit(255f)).cast("float")
    val codes = transform(v, x =>
      (when(scale === 0f, lit(0))
        .otherwise(round((x - mn) / scale).cast("int")) - 128)
        .cast("tinyint"))
    val err = sqrt(aggregate(
      zip_with(v.cast("array<double>"),
        dequantize(col("codes"), col("q_scale"), col("q_offset")).cast("array<double>"),
        (x, y) => (x - y) * (x - y)),
      lit(0d), (acc, e) => acc + e))
    val errL1 = aggregate(
      zip_with(v.cast("array<double>"),
        dequantize(col("codes"), col("q_scale"), col("q_offset")).cast("array<double>"),
        (x, y) => abs(x - y)),
      lit(0d), (acc, e) => acc + e)
    data
      .withColumn("q_offset", mn.cast("float"))
      .withColumn("q_scale", scale)
      .withColumn("codes", codes)
      .withColumn("q_err", err * lit(1.0 + 1e-9) + lit(1e-12))
      .withColumn("q_err_l1", errL1 * lit(1.0 + 1e-9) + lit(1e-12))
  }

  private def assertIdentical(data: DataFrame): Unit = {
    val cols = Seq("id", "codes", "q_scale", "q_offset", "q_err", "q_err_l1")
    val fused = graft.knn.Quantize.sq8(data).select(cols.map(col): _*).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Byte](1), r.getFloat(2), r.getFloat(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val hof = sq8Hof(data).select(cols.map(col): _*).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Byte](1), r.getFloat(2), r.getFloat(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(fused.keySet === hof.keySet)
    fused.foreach { case (id, f) =>
      val h = hof(id)
      assert(f._1 === h._1, s"codes diverge for id=$id")
      // scale/offset float-exact; errors double-exact (same op order)
      assert(f._2 === h._2 && f._3 === h._3, s"scale/offset diverge for id=$id")
      assert(f._4 === h._4, s"q_err diverges for id=$id: ${f._4} vs ${h._4}")
      assert(f._5 === h._5, s"q_err_l1 diverges for id=$id: ${f._5} vs ${h._5}")
    }
  }

  test("fused sq8 kernel is bit-identical to the HOF formulation on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assertIdentical(e.select(col("vec_id").as("id"), col("embedding").as("vector")))
  }

  test("fused sq8 kernel matches on adversarial shapes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Long, Array[Float])] = Seq(
      1L -> Array.fill(64)(3.25f),                       // constant → scale 0
      2L -> Array.fill(64)(0f),                          // zero vector
      3L -> Array(1e-30f, -1e-30f, 0f),                  // denormal-ish range
      4L -> Array(-5f, 5f),                              // symmetric negatives
      5L -> Array(42f),                                  // single element
      6L -> Array.tabulate(300)(i => (i - 150) * 0.37f), // wide range
      7L -> Array.fill(128)(rnd.nextFloat() * 2e3f - 1e3f),
      8L -> Array.tabulate(64)(i => math.pow(-1, i).toFloat * rnd.nextFloat()))
    assertIdentical(rows.toDF("id", "vector"))
  }

  test("normalize=true fuses the cosine front end: unit-norm encode, NULL for zero vectors") {
    import spark.implicits._
    val rows: Seq[(Long, Array[Float])] = Seq(
      1L -> Array(3f, 4f),
      2L -> Array(0f, 0f),
      3L -> Array.tabulate(32)(i => (i + 1).toFloat))
    val df = rows.toDF("id", "vector")
      .select(col("id"), graft.functions.vec.sq8Encode(col("vector"), normalize = true).as("e"))
    assert(df.filter(col("e").isNull).select("id").as[Long].collect().toSeq === Seq(2L))
    // manual normalize-then-encode must agree with the fused flag
    val norm = sqrt(aggregate(col("vector").cast("array<double>"), lit(0d), (acc, x) => acc + x * x))
    val manual = rows.toDF("id", "vector")
      .withColumn("__n", norm).filter(col("__n") > 0d)
      .withColumn("vector", transform(col("vector"), x => (x / col("__n")).cast("float")))
      .select(col("id"), graft.functions.vec.sq8Encode(col("vector")).as("e"))
    val a = df.filter(col("e").isNotNull).select(col("id"), col("e.codes"), col("e.q_err")).collect()
      .map(r => (r.getLong(0), r.getSeq[Byte](1), r.getDouble(2))).sortBy(_._1)
    val b = manual.select(col("id"), col("e.codes"), col("e.q_err")).collect()
      .map(r => (r.getLong(0), r.getSeq[Byte](1), r.getDouble(2))).sortBy(_._1)
    assert(a === b)
  }
}
