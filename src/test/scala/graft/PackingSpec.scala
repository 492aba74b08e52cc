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

  test("chunkTokens: stride/overlap window math, tail chunk, single-chunk shorts") {
    import spark.implicits._
    val d = Seq(
      (0L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (1L, "a b c"),                                  // short: one chunk
      (2L, "solo"))                                   // single token
      .toDF("doc_id", "text")
    val out = Packing.chunkTokens(d, chunkLen = 4, overlap = 1)
      .orderBy("doc_id", "chunk").collect()
    val doc0 = out.filter(_.getLong(0) == 0L)
    // stride 3: starts 0,3,6,9 — ceil((10-1)/3) = 3 chunks? (10-1+2)/3 = 3
    assert(doc0.map(r => (r.getLong(2), r.getLong(3))).toSeq ===
      Seq((0L, 4L), (3L, 7L), (6L, 10L)))
    assert(doc0.map(_.getString(5)).toSeq ===
      Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    // consecutive chunks overlap by exactly `overlap` tokens
    doc0.sliding(2).foreach { p =>
      assert(p(0).getLong(3) - p(1).getLong(2) === 1L)
    }
    assert(out.filter(_.getLong(0) == 1L).map(_.getString(5)).toSeq === Seq("a b c"))
    assert(out.filter(_.getLong(0) == 2L).map(_.getString(5)).toSeq === Seq("solo"))
    // full coverage: every token index lands in some chunk
    val covered = doc0.flatMap(r => r.getLong(2) until r.getLong(3)).toSet
    assert(covered === (0L until 10L).toSet)
    intercept[IllegalArgumentException](Packing.chunkTokens(d, 0, 0))
    intercept[IllegalArgumentException](Packing.chunkTokens(d, 4, 4))
  }
}
