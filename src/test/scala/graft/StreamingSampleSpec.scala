package graft

import graft.ops.Sampling
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

class StreamingSampleSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = (0L until 200L).map(i => (i, (i % 17) + 1.0)).toDF("doc_id", "w")

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("ws_spec").toString

  test("reservoir converges to the batch A-Res sample across batches") {
    val dir = freshDir()
    val sink = StreamingOps.weightedSampleSink(spark, dir, k = 25, weightCol = "w")
    sink(corpus.filter($"doc_id" % 2 === 0), 0L)
    sink(corpus.filter($"doc_id" % 2 === 1), 1L)
    val got = StreamingOps.weightedSampleMaintained(spark, dir)
      .select("doc_id", "w", "sample_rank").as[(Long, Double, Int)].collect().toSeq
    val want = Sampling.sampleWeighted(corpus, "doc_id", "w", k = 25)
      .select("doc_id", "w", "sample_rank").as[(Long, Double, Int)].collect().toSeq
    assert(got.sortBy(_._3) === want.sortBy(_._3))
  }

  test("committed batch redelivery is skipped; post-compaction replay is harmless") {
    val dir = freshDir()
    val sink = StreamingOps.weightedSampleSink(spark, dir, k = 10, weightCol = "w")
    sink(corpus.filter($"doc_id" < 100), 0L)
    sink(corpus.filter($"doc_id" < 100), 0L) // committed → skipped
    sink(corpus.filter($"doc_id" >= 100), 1L)
    val (n, did) = StreamingOps.compactWeightedSample(spark, dir, maxBatches = 1)
    assert(n === 2 && did)
    // gate below threshold: no-op
    assert(StreamingOps.compactWeightedSample(spark, dir, maxBatches = 1) === ((1, false)))
    sink(corpus.filter($"doc_id" < 100), 0L) // replayed after the fold
    val got = StreamingOps.weightedSampleMaintained(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    val want = Sampling.sampleWeighted(corpus, "doc_id", "w", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got === want)
  }

  test("compaction recovers from an orphaned segment left by a crashed swap") {
    val dir = freshDir()
    val sink = StreamingOps.weightedSampleSink(spark, dir, k = 10, weightCol = "w")
    sink(corpus.filter($"doc_id" < 100), 0L)
    sink(corpus.filter($"doc_id" >= 100), 1L)
    // simulate a crash between the compact-segment write and the manifest
    // swap: the orphan occupies the exact name the next compaction picks
    Seq((999L, 1.0, -1.0)).toDF("doc_id", "w", "__skey")
      .write.parquet(s"$dir/cand/batch=c0")
    val (_, did) = StreamingOps.compactWeightedSample(spark, dir, maxBatches = 1)
    assert(did)
    val got = StreamingOps.weightedSampleMaintained(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    val want = Sampling.sampleWeighted(corpus, "doc_id", "w", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got === want) // the orphan's junk row neither wedged nor leaked
  }

  test("restart with different parameters fails loudly") {
    val dir = freshDir()
    StreamingOps.weightedSampleSink(spark, dir, k = 10, weightCol = "w")(
      corpus.limit(10), 0L)
    val e = intercept[IllegalArgumentException] {
      StreamingOps.weightedSampleSink(spark, dir, k = 11, weightCol = "w")
    }
    assert(e.getMessage.contains("retroactively"))
  }

  test("an id arriving with two different weights fails the read") {
    val dir = freshDir()
    val sink = StreamingOps.weightedSampleSink(spark, dir, k = 10, weightCol = "w")
    sink(Seq((1L, 2.0), (2L, 3.0)).toDF("doc_id", "w"), 0L)
    sink(Seq((1L, 5.0)).toDF("doc_id", "w"), 1L)
    val e = intercept[IllegalArgumentException] {
      StreamingOps.weightedSampleMaintained(spark, dir).collect()
    }
    assert(e.getMessage.contains("two different weights"))
  }
}
