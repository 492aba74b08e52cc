package graft

import graft.ops.VectorDataset
import org.apache.spark.sql.functions._

/** Facade parity with the reference Dataset API
  * (`/root/reference/storage/dataset.go`): mutations route by id, searches
  * fan out per partition and k-merge, dimension mismatches error.
  */
class VectorDatasetSpec extends SparkTestBase {
  import spark.implicits._

  private def ds(rows: (Long, Seq[Float])*) =
    VectorDataset(spark,
      rows.toDF("id", "vector"), dimension = 2, numPartitions = 2)

  test("insert/update/remove round-trip with routing") {
    val d0 = ds((1L, Seq(0f, 0f)), (2L, Seq(1f, 1f)))
    val d1 = d0.batchInsert(Seq((3L, Seq(2f, 2f))).toDF("id", "vector"))
    assert(d1.count() === 3)
    val d2 = d1.batchUpdate(Seq((2L, Seq(9f, 9f))).toDF("id", "vector"))
    val d3 = d2.batchRemove(Seq(Tuple1(1L)).toDF("id"))
    assert(d3.count() === 2)
    val res = d3.search(Array((100L, Array(8f, 8f))), k = 1).collect()
    assert(res.head.getLong(1) === 2L) // updated vector now nearest
  }

  test("duplicate insert errors (ItemAlreadyExistsError)") {
    val d0 = ds((1L, Seq(0f, 0f)))
    intercept[IllegalArgumentException](
      d0.batchInsert(Seq((1L, Seq(1f, 1f))).toDF("id", "vector")))
  }

  test("dimension mismatch errors (DimensionMissmatchErr, dataset.go:526)") {
    val d0 = ds((1L, Seq(0f, 0f)))
    intercept[IllegalArgumentException](
      d0.batchInsert(Seq((2L, Seq(1f, 1f, 1f))).toDF("id", "vector")))
    intercept[IllegalArgumentException](
      d0.search(Array((1L, Array(1f, 2f, 3f))), k = 1))
  }

  test("exact search matches approx search on small data; save/load round-trips") {
    val vecs = (0L until 100L).map { i =>
      (i, Seq(math.sin(i.toDouble).toFloat, math.cos(i.toDouble).toFloat))
    }
    val d = VectorDataset(spark, vecs.toDF("id", "vector"), dimension = 2, numPartitions = 2)
    val q = Array((0L, Array(0.5f, 0.5f)))
    val exact = d.search(q, 5).collect().map(_.getLong(1)).toSet
    val approx = d.searchApprox(q, 5).collect().map(_.getLong(1)).toSet
    assert(approx.intersect(exact).size >= 4)

    val path = java.nio.file.Files.createTempDirectory("vds").toString + "/data"
    d.save(path)
    assert(VectorDataset.load(spark, path, dimension = 2).count() === 100)
  }
}
