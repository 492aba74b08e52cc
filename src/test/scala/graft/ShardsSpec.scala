package graft

import graft.ops.Shards
import org.apache.spark.sql.functions._

/** Shard export integrity: deterministic membership, round-trip equality,
  * and — the reason the machinery exists — loud failure on every tamper
  * class: deleted file, foreign file, truncated file, modified content,
  * missing manifest.
  */
class ShardsSpec extends SparkTestBase {

  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("shards_spec").toString + "/exp"

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("round trip: content identical, shard membership a pure function of ids") {
    val dir = freshDir()
    Shards.write(docs, dir, "doc_id", nShards = 4)
    val back = Shards.read(spark, dir, verifyContent = true)
    assert(back.drop("shard").select("doc_id").as[Long].collect().sorted.toSeq ===
      docs.select("doc_id").as[Long].collect().sorted.toSeq)
    // every row landed in the shard the pure function names
    val misplaced = back.filter(col("shard") =!= Shards.shardOf(col("doc_id"), 4)).count()
    assert(misplaced === 0)
    // a second export of a REPARTITIONED input produces identical stats
    val dir2 = freshDir()
    Shards.write(docs.repartition(7), dir2, "doc_id", nShards = 4)
    def stats(d: String) = spark.read.parquet(s"$d/stats")
      .select("shard", "n_rows", "digest").as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(stats(dir) === stats(dir2))
  }

  private def firstDataFile(dir: String): java.io.File = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    walk(new java.io.File(s"$dir/data")).minBy(_.getPath)
  }

  private def messages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))

  test("deleted shard file fails loudly at read time") {
    val dir = freshDir()
    Shards.write(docs, dir, "doc_id", nShards = 4)
    assert(firstDataFile(dir).delete())
    val ex = intercept[Exception](Shards.read(spark, dir))
    assert(messages(ex).exists(_.contains("INCOMPLETE")))
  }

  test("foreign file fails loudly") {
    val dir = freshDir()
    Shards.write(docs, dir, "doc_id", nShards = 4)
    val alien = new java.io.File(s"$dir/data/shard=0/zz-alien.parquet")
    java.nio.file.Files.write(alien.toPath, Array[Byte](1, 2, 3))
    val ex = intercept[Exception](Shards.read(spark, dir))
    assert(messages(ex).exists(_.contains("foreign files")))
  }

  test("truncated file fails loudly on length, modified content on digest") {
    val dir = freshDir()
    Shards.write(docs, dir, "doc_id", nShards = 4)
    val f = firstDataFile(dir)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    java.nio.file.Files.write(f.toPath, bytes.dropRight(10))
    val exLen = intercept[Exception](Shards.read(spark, dir))
    assert(messages(exLen).exists(_.contains("torn")))
    // same length, different bytes: file check passes, digest must not.
    // parquet footers carry checksums, so flip bytes INSIDE a data page
    // region is unreliable to keep parquet-readable — instead rewrite a
    // whole shard with one row swapped through the parquet writer
    java.nio.file.Files.write(f.toPath, bytes) // restore
    val shardDir = f.getParentFile
    val shardId = shardDir.getName.stripPrefix("shard=").toInt
    val rows = spark.read.parquet(shardDir.getPath)
    val swapped = rows.withColumn("n_chars",
      when(col("doc_id") === rows.select(min("doc_id")).head().getLong(0),
        col("n_chars") + 1).otherwise(col("n_chars")))
    val tmp = freshDir()
    swapped.coalesce(1).write.parquet(tmp)
    val newFile = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
    // replace the shard's files with the tampered rewrite, then fix the
    // manifest lengths so ONLY the digest can catch it
    shardDir.listFiles().filter(_.getName.endsWith(".parquet")).foreach(_.delete())
    val dst = new java.io.File(shardDir, newFile.getName)
    java.nio.file.Files.move(newFile.toPath, dst.toPath)
    val hconf = spark.sparkContext.hadoopConfiguration
    val relisted = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val q = p.getFileSystem(hconf).makeQualified(p).toString
      Seq("data/*/*.parquet", "stats/*.parquet")
        .flatMap(pat => graft.io.HadoopIO.globWithLength(dir, pat, hconf))
        .map { case (uri, len) => graft.io.ManifestEntry(uri.stripPrefix(q + "/"), len, 0L) }
    }
    graft.io.Manifest.write(dir, relisted, hconf)
    assert(Shards.read(spark, dir).count() > 0) // file-level check alone passes
    val exDig = intercept[Exception](Shards.validate(spark, dir))
    assert(messages(exDig).exists(m =>
      m.contains("FAILED content verification") && m.contains(shardId.toString)))
  }

  test("a directory without a manifest is refused") {
    val dir = freshDir()
    Shards.write(docs, dir, "doc_id", nShards = 2)
    assert(new java.io.File(s"$dir/${graft.io.Manifest.FileName}").delete())
    val ex = intercept[Exception](Shards.read(spark, dir))
    assert(messages(ex).exists(_.contains("no manifest")))
  }
}
