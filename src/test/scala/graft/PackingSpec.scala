package graft

import graft.ops.Packing
import org.apache.spark.sql.functions._

/** Concat-and-chunk invariants: token conservation, exact block fill except
  * stream tails, contiguous block ids, partition-layout invariance.
  */
class PackingSpec extends SparkTestBase {

  private val L = 128

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val packed = Packing.packBlocks(docs, blockLen = L, nShards = 2).cache()

  test("every document's tokens are conserved across its block rows") {
    val bad = packed.groupBy("doc_id")
      .agg(sum("n_in_block").as("s"), first("n_tokens").as("n"))
      .filter(col("s") =!= col("n"))
    assert(bad.count() == 0)
  }

  test("every non-tail block is exactly full; tails under-fill") {
    val tails = packed.groupBy("source", "shard").agg(max("block").as("tail"))
    val fills = Packing.packSummary(packed, L)
      .join(tails, Seq("source", "shard"))
    assert(fills.filter(col("block") < col("tail") && col("n_tokens") =!= L).count() == 0)
    assert(fills.filter(col("n_tokens") > L).count() == 0)
  }

  test("block ids are contiguous from 0 per stream") {
    val streams = packed.groupBy("source", "shard")
      .agg(min("block").as("lo"), max("block").as("hi"),
        countDistinct("block").as("n"))
    assert(streams.filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1).count() == 0)
  }

  test("layout-invariant: same rows under a different input partitioning") {
    val a = packed.orderBy("source", "shard", "block", "doc_id").collect().toSeq
    val b = Packing.packBlocks(docs.repartition(7), L, 2)
      .orderBy("source", "shard", "block", "doc_id").collect().toSeq
    assert(a == b)
  }

  test("degenerate inputs are rejected loudly") {
    intercept[IllegalArgumentException](Packing.packBlocks(docs, 0, 2))
    intercept[IllegalArgumentException](Packing.packBlocks(docs, L, 0))
  }
}
