package graft

import java.nio.file.{Files, Paths}

import graft.sources.{WarcFetch, WarcFormat}
import org.apache.spark.sql.functions._

class WarcFetchSpec extends SparkTestBase {

  private def rec(i: Int, payload: String): Array[Byte] =
    WarcFormat.buildRecord("response", s"<urn:uuid:rec-$i>", s"http://example.com/p/$i",
      "2024-01-01T00:00:00Z", "text/plain", payload.getBytes("UTF-8"))

  /** Build one archive; returns (path, id -> offset). Plain files use raw
    * byte offsets, gz files compressed member-start offsets.
    */
  private def build(dir: String, name: String, ids: Seq[Int]): (String, Map[Int, Long]) = {
    val gz = name.endsWith(".gz")
    val bos = new java.io.ByteArrayOutputStream()
    val offsets = ids.map { i =>
      // interleave noise so offsets are never trivially cumulative
      val noise = rec(i + 90000, s"noise $i")
      bos.write(if (gz) WarcFormat.gzipMember(noise) else noise)
      val off = bos.size().toLong
      val r = rec(i, s"payload for $i")
      bos.write(if (gz) WarcFormat.gzipMember(r) else r)
      i -> off
    }.toMap
    val p = Paths.get(dir, name)
    Files.write(p, bos.toByteArray)
    (p.toString, offsets)
  }

  test("fetch: exact records from plain and gzip archives, payloads verified") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warc_fetch").toString
    val (p0, o0) = build(dir, "a.warc", Seq(0, 1, 2, 3))
    val (p1, o1) = build(dir, "b.warc.gz", Seq(10, 11, 12))
    // fetch a SUBSET, out of order, with a duplicate row
    val want = Seq((p0, o0(2)), (p1, o1(11)), (p0, o0(0)), (p1, o1(12)), (p0, o0(2)))
    val out = WarcFetch.fetch(want.toDF("path", "offset"))
      .select(col("offset"), col("record_id"), col("target_uri"),
        col("payload").cast("string").as("text"))
      .collect()
    assert(out.length === want.length) // duplicate row fetches twice
    out.foreach { r =>
      val id = r.getString(2).split("/").last.toInt
      assert(r.getString(1) === s"<urn:uuid:rec-$id>")
      assert(r.getString(3) === s"payload for $id")
      assert(Seq(o0, o1).exists(_.get(id).contains(r.getLong(0)))) // echoes request
    }
    assert(out.count(_.getString(3) == "payload for 2") === 2)
  }

  test("fetch result equals the full scan restricted to the fetched subset") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warc_fetch_eq").toString
    val (p0, o0) = build(dir, "c.warc", (0 until 20))
    val picked = o0.filter(_._1 % 3 == 0)
    val fetched = WarcFetch.fetch(picked.toSeq.map { case (_, off) => (p0, off) }.toDF("path", "offset"))
      .select(col("record_id"), md5(col("payload")).as("m"))
    val scanned = spark.read.format("warc").load(p0)
      .filter(col("target_uri").rlike("p/(0|3|6|9|12|15|18)$"))
      .select(col("record_id"), md5(col("payload")).as("m"))
    assert(fetched.sort("record_id").collect().toSeq ===
      scanned.sort("record_id").collect().toSeq)
  }

  test("wrong offsets fail loudly with path context, never a neighbor's bytes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warc_fetch_bad").toString
    val (p0, o0) = build(dir, "d.warc", Seq(0, 1))
    val midRecord = o0(1) + 7 // inside record 1's header block
    val e = intercept[Exception](
      WarcFetch.fetch(Seq((p0, midRecord)).toDF("path", "offset")).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("d.warc")), msgs(e).mkString(" | "))
    // gz: an offset not at a member boundary is a malformed member, loudly
    val (p1, o1) = build(dir, "e.warc.gz", Seq(5))
    val e2 = intercept[Exception](
      WarcFetch.fetch(Seq((p1, o1(5) + 3)).toDF("path", "offset")).collect())
    assert(msgs(e2).exists(m => m.contains("e.warc.gz")), msgs(e2).mkString(" | "))
    // missing columns refused with a clear message
    val e3 = intercept[IllegalArgumentException](
      WarcFetch.fetch(Seq(("x", 1L)).toDF("file", "offset")))
    assert(e3.getMessage.contains("path"))
    // the gz rethrow carries the REQUESTED compressed offset
    assert(msgs(e2).exists(_.contains(s"compressed offset ${o1(5) + 3}")),
      msgs(e2).mkString(" | "))
    // a null path row (malformed CDX join output) gets a REAL error,
    // not an opaque NPE
    val e4 = intercept[Exception](
      WarcFetch.fetch(Seq((Option.empty[String], Option(1L)), (Option(p0), Option(o0(0))))
        .toDF("path", "offset")).collect())
    assert(msgs(e4).exists(_.contains("null path")), msgs(e4).mkString(" | "))
    val e5 = intercept[Exception](
      WarcFetch.fetch(Seq((Option(p0), Option.empty[Long]))
        .toDF("path", "offset")).collect())
    assert(msgs(e5).exists(_.contains("null offset")), msgs(e5).mkString(" | "))
  }
}
