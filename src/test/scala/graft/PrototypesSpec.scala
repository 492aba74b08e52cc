package graft

import graft.ops.Prototypes
import org.apache.spark.sql.functions._

class PrototypesSpec extends SparkTestBase {
  import spark.implicits._

  // two well-separated blobs on the x axis; within each blob, points at
  // increasing distance from the blob center so difficulty order is known
  private def blobs = {
    val a = (0 until 10).map(i => (i.toLong, Array(0f + i * 0.01f, 0f)))
    val b = (0 until 10).map(i => (100L + i, Array(50f + i * 0.01f, 0f)))
    (a ++ b).toDF("id", "vector")
  }

  test("prunes exactly floor(f*n) easiest per cluster, keeps the hardest") {
    val res = Prototypes.prunePrototypes(spark, blobs, c = 2,
        pruneFraction = 0.3, iterations = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    assert(res.length === 20)
    val byCluster = res.groupBy(_._2)
    assert(byCluster.size === 2)
    byCluster.foreach { case (_, rows) =>
      val pruned = rows.filter(!_._4)
      val kept = rows.filter(_._4)
      assert(pruned.length === 3) // floor(0.3 * 10)
      assert(kept.length === 7)
      // boundary: every pruned (dist, id) strictly below every kept one
      val pMax = pruned.map(r => (r._3, r._1)).max
      val kMin = kept.map(r => (r._3, r._1)).min
      assert(Ordering[(Double, Long)].lt(pMax, kMin))
    }
  }

  test("pruneHardest inverts the boundary: kept sit strictly below pruned") {
    val res = Prototypes.prunePrototypes(spark, blobs, c = 2,
        pruneFraction = 0.3, iterations = 5, pruneHardest = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    res.groupBy(_._2).foreach { case (_, rows) =>
      val pruned = rows.filter(!_._4)
      val kept = rows.filter(_._4)
      assert(pruned.length === 3)
      val kMax = kept.map(r => (r._3, r._1)).max
      val pMin = pruned.map(r => (r._3, r._1)).min
      assert(Ordering[(Double, Long)].lt(kMax, pMin))
    }
  }

  test("pruneFraction 0 keeps everything; determinism across runs") {
    val all = Prototypes.prunePrototypes(spark, blobs, c = 2, pruneFraction = 0.0)
    assert(all.filter(!col("keep")).count() === 0)
    val r1 = Prototypes.prunePrototypes(spark, blobs, c = 2, pruneFraction = 0.3)
      .orderBy("id").collect().toSeq
    val r2 = Prototypes.prunePrototypes(spark, blobs, c = 2, pruneFraction = 0.3)
      .orderBy("id").collect().toSeq
    assert(r1 === r2)
  }

  test("non-finite vectors fail loudly instead of ranking") {
    val bad = Seq((1L, Array(1f, 2f)), (2L, Array(Float.NaN, 0f))).toDF("id", "vector")
    val e = intercept[Exception] {
      Prototypes.prunePrototypes(spark, bad, c = 1, pruneFraction = 0.5).collect()
    }
    assert(e.getMessage.contains("non-finite difficulty")
      || Option(e.getCause).exists(_.getMessage.contains("non-finite difficulty")))
  }
}
