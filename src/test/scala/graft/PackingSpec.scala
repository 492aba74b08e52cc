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

  test("packBestFit: non-splitting, capacity-respecting, matches reference FFD") {
    val out = Packing.packBestFit(docs, blockLen = L, nShards = 2).cache()
    // exactly one bin per document — the whole point vs packBlocks
    assert(out.groupBy("doc_id").count().filter(col("count") =!= 1).count() == 0)
    assert(out.count() == docs.count())
    // no bin over capacity (no oversized docs at this blockLen in sf0.001
    // corpus would make this vacuous — assert the premise too)
    val oversized = out.filter(col("n_tokens") > L).count()
    val fills = Packing.packBestFitSummary(out, L)
    if (oversized == 0) assert(fills.filter(col("n_tokens") > L).count() == 0)
    // independent reference FFD over the same ordering
    val byGroup = out.collect().groupBy(r => (r.getString(0), r.getLong(1)))
    byGroup.foreach { case (_, rows) =>
      val items = rows.map(r => (r.getLong(3), r.getLong(4)))
        .sortBy { case (id, n) => (-n, id) }
      val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
      val expect = items.map { case (id, n) =>
        var b = 0
        while (b < rem.length && rem(b) < n) b += 1
        if (b == rem.length) rem += L - n else rem(b) -= n
        id -> b.toLong
      }.toMap
      rows.foreach(r => assert(expect(r.getLong(3)) == r.getLong(2),
        s"doc ${r.getLong(3)} bin ${r.getLong(2)} != reference ${expect(r.getLong(3))}"))
    }
    out.unpersist()
  }

  test("packBestFit: oversized documents land alone in their own overfull bin") {
    import spark.implicits._
    val d = Seq(
      (0L, (1 to 200).map(i => s"w$i").mkString(" ")), // 201 tokens w/ EOS > 128
      (2L, (1 to 60).map(i => s"x$i").mkString(" ")),
      (4L, (1 to 50).map(i => s"y$i").mkString(" ")))
      .toDF("doc_id", "text").withColumn("source", lit("s"))
    val out = Packing.packBestFit(d, blockLen = L, nShards = 1)
      .collect().map(r => r.getLong(3) -> r.getLong(2)).toMap
    assert(out(0L) == 0L)            // oversized: first (longest), own bin
    assert(out(2L) == 1L && out(4L) == 1L) // 61+51=112 <= 128 share the next
  }

  test("packBestFit kills splits at bounded padding; FFD beats id-order next-fit") {
    import spark.implicits._
    // skewed lengths: a few giants + many smalls interleaved by id
    val d = (0 until 120).map { i =>
      val n = if (i % 8 == 0) 100 else 10 + (i % 7)
      (i.toLong, (1 to n).map(j => s"t${i}_$j").mkString(" "))
    }.toDF("doc_id", "text").withColumn("source", lit("s"))
    val ffd = Packing.packBestFit(d, blockLen = L, nShards = 1)
    // packBlocks SPLITS documents across blocks on this corpus; FFD never
    val splitDocs = Packing.packBlocks(d, L, 1)
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(splitDocs > 0)
    assert(ffd.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    // FFD bins <= naive next-fit-in-id-order bins (less padding waste)
    val items: Array[Long] = d.select(col("doc_id"),
        (size(graft.text.TextAnalysis.tokens(col("text"))) + 1).cast("long").as("n"))
      .orderBy("doc_id").collect().map(r => r.getLong(1))
    var nfBins = 0; var cur = 0L
    items.foreach { n =>
      if (nfBins == 0 || cur + n > L) { nfBins += 1; cur = n } else cur += n
    }
    val ffdBins = ffd.select("bin").distinct().count()
    assert(ffdBins <= nfBins, s"FFD $ffdBins bins > next-fit $nfBins")
    // and within 11/9 of the token-mass lower bound (the FFD guarantee)
    val lower = math.ceil(items.sum.toDouble / L)
    assert(ffdBins <= math.ceil(11.0 / 9.0 * lower) + 1)
  }

  test("packBestFit: layout-invariant and loud on degenerate params") {
    val a = Packing.packBestFit(docs, L, 2)
      .orderBy("source", "shard", "bin", "doc_id").collect().toSeq
    val b = Packing.packBestFit(docs.repartition(7), L, 2)
      .orderBy("source", "shard", "bin", "doc_id").collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException](Packing.packBestFit(docs, 0, 2))
    intercept[IllegalArgumentException](Packing.packBestFit(docs, L, 0))
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
