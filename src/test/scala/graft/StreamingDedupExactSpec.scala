package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** dedupExactSink — the unbounded digest log: batch-split independence,
  * replay/compaction guards, fail-loud manifests.
  */
class StreamingDedupExactSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  private def groups(dir: String): Map[String, (Long, Long)] =
    StreamingOps.dedupExactMaintained(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("converges to batch exactGroups across adversarial splits") {
    val dir = java.nio.file.Files.createTempDirectory("de_spec").toString
    val sink = StreamingOps.dedupExactSink(spark, dir)
    // copy (id 900) arrives FIRST; its original (id 1) arrives two
    // batches later — beyond any watermark, smaller id last
    sink(docs(900L -> "alpha", 901L -> "beta"), 0L)
    sink(docs(2L -> "gamma"), 1L)
    sink(docs(1L -> "alpha", 3L -> "beta"), 2L)
    val got = groups(dir)
    val want = graft.dedup.Dedup.exactGroups(
        docs(900L -> "alpha", 901L -> "beta", 2L -> "gamma", 1L -> "alpha", 3L -> "beta"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
    assert(got.values.toSet === Set((1L, 2L), (3L, 2L), (2L, 1L)))
  }

  test("exact-batch replay skips; post-compaction redelivery skips via folded ids") {
    val dir = java.nio.file.Files.createTempDirectory("de_spec").toString
    val sink = StreamingOps.dedupExactSink(spark, dir)
    sink(docs(1L -> "x", 2L -> "x"), 0L)
    sink(docs(1L -> "x", 2L -> "x"), 0L) // manifest replay guard
    assert(groups(dir).values.toSet === Set((1L, 2L)))
    StreamingOps.compactDedupExact(spark, dir)
    sink(docs(1L -> "x", 2L -> "x"), 0L) // folded-ids guard
    assert(groups(dir).values.toSet === Set((1L, 2L)))
    sink(docs(3L -> "x"), 1L) // genuinely new batch still lands
    assert(groups(dir).values.toSet === Set((1L, 3L)))
  }

  test("restart with different columns refuses; matching restart proceeds") {
    val dir = java.nio.file.Files.createTempDirectory("de_spec").toString
    StreamingOps.dedupExactSink(spark, dir)(docs(1L -> "x"), 0L)
    intercept[IllegalArgumentException](
      StreamingOps.dedupExactSink(spark, dir, idCol = "other_id"))
    val again = StreamingOps.dedupExactSink(spark, dir)
    again(docs(2L -> "y"), 1L)
    assert(groups(dir).size === 2)
  }

  test("a lost committed delta file fails the read loudly") {
    val dir = java.nio.file.Files.createTempDirectory("de_spec").toString
    StreamingOps.dedupExactSink(spark, dir)(docs(1L -> "x"), 0L)
    val hconf = spark.sparkContext.hadoopConfiguration
    val lost = graft.io.HadoopIO.glob(s"$dir/dig/batch=0", "*.parquet", hconf).head
    graft.io.HadoopIO.delete(lost, hconf)
    val e = intercept[Exception](StreamingOps.dedupExactMaintained(spark, dir).collect())
    assert(e.getMessage != null)
  }

  test("not-a-dedup-dir and empty log behave") {
    val empty = java.nio.file.Files.createTempDirectory("de_spec").toString
    intercept[IllegalArgumentException](StreamingOps.dedupExactMaintained(spark, empty))
    val dir = java.nio.file.Files.createTempDirectory("de_spec").toString
    StreamingOps.dedupExactSink(spark, dir) // init only, no batch
    assert(StreamingOps.dedupExactMaintained(spark, dir).count() === 0)
  }
}
