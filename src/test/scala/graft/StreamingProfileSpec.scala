package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

class StreamingProfileSpec extends SparkTestBase {
  import spark.implicits._

  private def profDocs = (0L until 120L).map { i =>
    (i, s"s${i % 3}", s"l${i % 4}", "word " * ((i % 7) + 1).toInt, ((i % 7) + 1) * 5)
  }.toDF("doc_id", "source", "lang", "text", "n_chars")

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("cp_spec").toString

  private def batchProfile = profDocs.groupBy("source")
    .agg(count(lit(1)).as("n_docs"), countDistinct("lang").as("n_langs"),
      sum($"n_chars".cast("long")).as("total_chars"),
      sum(size(split(trim($"text"), "\\s+")).cast("long")).as("total_tokens"))
    .orderBy("source")
    .as[(String, Long, Long, Long, Long)]

  test("totals converge to the batch aggregate across batches") {
    val dir = freshDir()
    val sink = StreamingOps.corpusProfileSink(spark, dir)
    sink(profDocs.filter($"doc_id" % 2 === 0), 0L)
    sink(profDocs.filter($"doc_id" % 2 === 1), 1L)
    val got = StreamingOps.corpusProfileMaintained(spark, dir)
      .orderBy("source")
      .select("source", "n_docs", "n_langs", "total_chars", "total_tokens")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === batchProfile.collect().toSeq)
  }

  test("committed and post-compaction replays never double-count") {
    val dir = freshDir()
    val sink = StreamingOps.corpusProfileSink(spark, dir)
    sink(profDocs.filter($"doc_id" % 2 === 0), 0L)
    sink(profDocs.filter($"doc_id" % 2 === 0), 0L) // committed → skip
    sink(profDocs.filter($"doc_id" % 2 === 1), 1L)
    StreamingOps.compactCorpusProfile(spark, dir)
    sink(profDocs.filter($"doc_id" % 2 === 0), 0L) // folded-id → skip
    sink(profDocs.filter($"doc_id" % 2 === 1), 1L) // folded-id → skip
    val got = StreamingOps.corpusProfileMaintained(spark, dir)
      .orderBy("source")
      .select("source", "n_docs", "n_langs", "total_chars", "total_tokens")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === batchProfile.collect().toSeq)
  }

  test("restart with different columns fails loudly") {
    val dir = freshDir()
    StreamingOps.corpusProfileSink(spark, dir)(profDocs.limit(5), 0L)
    val e = intercept[IllegalArgumentException] {
      StreamingOps.corpusProfileSink(spark, dir, langCol = "source")
    }
    assert(e.getMessage.contains("incomparable totals"))
  }
}
