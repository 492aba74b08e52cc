package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.WarcFormat

class WarcSourceSpec extends SparkTestBase {

  private def rec(i: Int, rtype: String, payload: String): Array[Byte] =
    WarcFormat.buildRecord(rtype, s"<urn:uuid:rec-$i>", s"http://example.com/p/$i",
      "2024-01-01T00:00:00Z", "text/plain", payload.getBytes("UTF-8"))

  private def writeFile(dir: String, name: String, bytes: Array[Byte]): String = {
    val p = Paths.get(dir, name)
    Files.write(p, bytes)
    p.toString
  }

  private def tmp(): String = Files.createTempDirectory("warc_spec").toString

  /** Flatten a failure's cause chain to its messages. */
  private def msgs(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))

  test("round trip: all columns, offsets, multiple records") {
    val dir = tmp()
    val r0 = rec(0, "response", "hello world")
    val r1 = rec(1, "request", "GET /")
    val r2 = rec(2, "conversion", "extracted text")
    writeFile(dir, "a.warc", r0 ++ r1 ++ r2)
    val got = spark.read.format("warc").load(dir)
      .orderBy("offset").collect()
    assert(got.length === 3)
    val row0 = got(0)
    assert(row0.getAs[Long]("offset") === 0L)
    assert(row0.getAs[String]("record_id") === "<urn:uuid:rec-0>")
    assert(row0.getAs[String]("record_type") === "response")
    assert(row0.getAs[String]("target_uri") === "http://example.com/p/0")
    assert(row0.getAs[String]("warc_date") === "2024-01-01T00:00:00Z")
    assert(row0.getAs[String]("content_type") === "text/plain")
    assert(row0.getAs[Long]("content_length") === 11L)
    assert(new String(row0.getAs[Array[Byte]]("payload"), "UTF-8") === "hello world")
    assert(got(1).getAs[Long]("offset") === r0.length.toLong)
    assert(got(2).getAs[Long]("offset") === (r0.length + r1.length).toLong)
    assert(new String(got(2).getAs[Array[Byte]]("payload"), "UTF-8") === "extracted text")
  }

  test("record_type pushdown shows in the plan and filters records") {
    val dir = tmp()
    writeFile(dir, "a.warc",
      rec(0, "warcinfo", "info") ++ rec(1, "response", "page one") ++
        rec(2, "request", "GET /") ++ rec(3, "response", "page two"))
    val df = spark.read.format("warc").load(dir)
      .filter(col("record_type") === "response")
      .select("target_uri", "payload")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("record_type"),
      s"pushed filter missing from plan:\n$plan")
    val rows = df.collect()
    assert(rows.map(r => new String(r.getAs[Array[Byte]]("payload"), "UTF-8")).sorted
      === Array("page one", "page two"))
  }

  test("column pruning: headers-only projection drops payload from ReadSchema") {
    val dir = tmp()
    writeFile(dir, "a.warc", rec(0, "response", "x" * 10000))
    val df = spark.read.format("warc").load(dir).select("target_uri", "content_length")
    assert(df.queryExecution.executedPlan.schema.fieldNames.toSet
      === Set("target_uri", "content_length"))
    assert(df.head().getLong(1) === 10000L)
  }

  test("record-boundary splits: many small splits, no loss, no duplication") {
    val dir = tmp()
    // payloads carry DECOY magic: separator + version line with an
    // invalid header block — the sync validator must reject them
    val decoy = "\r\n\r\nWARC/1.0\r\nnot a header line\r\n\r\n"
    val recs = (0 until 50).map(i => rec(i, "response", s"payload $i $decoy tail " + ("y" * (i * 7))))
    writeFile(dir, "a.warc", recs.reduce(_ ++ _))
    val full = spark.read.format("warc").load(dir)
    val split = spark.read.format("warc").option("maxPartitionBytes", "1024").load(dir)
    assert(split.rdd.getNumPartitions > 5, s"expected many splits, got ${split.rdd.getNumPartitions}")
    val a = full.select("record_id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted
    val b = split.select("record_id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted
    assert(a.length === 50)
    assert(b.toSeq === a.toSeq)
    // payload integrity across split reads
    val sums = split.select(sum(length(col("payload"))), sum(col("content_length"))).head()
    assert(sums.getLong(0) === sums.getLong(1))
  }

  test("gzip member-per-record reads all records with uncompressed offsets") {
    val dir = tmp()
    val recs = (0 until 5).map(i => rec(i, if (i % 2 == 0) "response" else "metadata", s"gz payload $i"))
    val gz = recs.map(WarcFormat.gzipMember).reduce(_ ++ _)
    writeFile(dir, "a.warc.gz", gz)
    val df = spark.read.format("warc").load(dir).orderBy("offset")
    assert(df.rdd.getNumPartitions === 1) // gzip: one partition per file
    val rows = df.collect()
    assert(rows.length === 5)
    assert(rows(0).getAs[Long]("offset") === 0L)
    assert(rows(1).getAs[Long]("offset") === recs(0).length.toLong) // UNCOMPRESSED offsets
    assert(new String(rows(4).getAs[Array[Byte]]("payload"), "UTF-8") === "gz payload 4")
    // pushdown on the gz path too
    assert(spark.read.format("warc").load(dir)
      .filter(col("record_type") === "response").count() === 3)
  }

  test("torn records fail loudly: short payload, missing trailer, mid-header EOF") {
    def readAll(bytes: Array[Byte]): Unit = {
      val dir = tmp()
      writeFile(dir, "torn.warc", bytes)
      spark.read.format("warc").load(dir).collect()
    }
    val good = rec(0, "response", "complete payload")
    // EOF inside the payload
    val e1 = intercept[org.apache.spark.SparkException](
      readAll(good ++ rec(1, "response", "x" * 100).dropRight(60)))
    assert(e1.getMessage.contains("torn WARC") || e1.getCause.getMessage.contains("torn WARC"))
    // missing trailing CRLFCRLF
    val e2 = intercept[org.apache.spark.SparkException](readAll(good.dropRight(2)))
    assert(e2.getMessage.contains("WARC") || e2.getCause.getMessage.contains("WARC"))
    // EOF mid-header
    val e3 = intercept[org.apache.spark.SparkException](readAll(good.take(20)))
    assert(e3.getMessage.contains("WARC") || e3.getCause.getMessage.contains("WARC"))
    // not a WARC file at all
    val e4 = intercept[org.apache.spark.SparkException](readAll("not a warc\r\n".getBytes))
    assert(e4.getMessage.contains("WARC") || e4.getCause.getMessage.contains("WARC"))
  }

  test("write path: round trip plain and gzip, defaults, overwrite contract") {
    import spark.implicits._
    val df = Seq(
      (1L, "first doc", "response"),
      (2L, "second doc", "conversion"),
      (3L, "third doc", "response"))
      .toDF("id", "text", "rtype")
      .select(col("rtype").as("record_type"),
        concat(lit("http://w/p/"), col("id")).as("target_uri"),
        encode(col("text"), "UTF-8").as("payload"))
    Seq(false, true).foreach { gz =>
      val dir = tmp()
      df.repartition(2).write.format("warc").option("gzip", gz).mode("overwrite").save(dir)
      val back = spark.read.format("warc").load(dir)
      val rows = back.orderBy("target_uri").collect()
      assert(rows.length === 3, s"gz=$gz")
      assert(rows.map(r => new String(r.getAs[Array[Byte]]("payload"), "UTF-8")).sorted
        === Array("first doc", "second doc", "third doc"))
      assert(rows.map(_.getAs[String]("record_type")).count(_ == "response") === 2)
      // defaults fill the omitted headers
      assert(rows.forall(_.getAs[String]("content_type") === "text/plain"))
      assert(rows.forall(_.getAs[String]("warc_date") === "1970-01-01T00:00:00Z"))
      assert(rows.forall(_.getAs[String]("record_id").startsWith("<urn:graft:")))
      // append into a non-empty dir refuses; overwrite replaces
      val e = intercept[Exception](df.write.format("warc").mode("append").save(dir))
      assert(e.getMessage.contains("overwrite"))
      df.limit(1).write.format("warc").option("gzip", gz).mode("overwrite").save(dir)
      assert(spark.read.format("warc").load(dir).count() === 1)
    }
    // payload-only frame works; bad schema refuses
    val dir2 = tmp()
    Seq("x").toDF("text").select(encode(col("text"), "UTF-8").as("payload"))
      .write.format("warc").mode("overwrite").save(dir2)
    assert(spark.read.format("warc").load(dir2).count() === 1)
    val bad = intercept[Exception](
      Seq(("a", 1)).toDF("payload", "n").write.format("warc").mode("overwrite").save(tmp()))
    assert(bad.getMessage.contains("warc write"))
  }

  test("streaming: offset snapshots, incremental files only, immutability guard") {
    import graft.sources.WarcOffset
    // offset json round trip incl. escapes
    val off = WarcOffset(Map("/a/b.warc" -> 10L, "/w \"q\"\\x.warc" -> 7L))
    assert(WarcOffset.fromJson(off.json()) === off)
    assert(WarcOffset.fromJson(WarcOffset(Map.empty).json()) === WarcOffset(Map.empty))

    val dir = tmp()
    val ckpt = Files.createTempDirectory("warc_ckpt").toString
    writeFile(dir, "a.warc", rec(0, "response", "batch one a") ++ rec(1, "response", "batch one b"))
    def runOnce(name: String): Long = {
      val seen = new java.util.concurrent.atomic.AtomicLong(0)
      val q = spark.readStream.format("warc").load(dir)
        .select("record_id", "content_length")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          seen.addAndGet(b.count()); ()
        }
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      seen.get()
    }
    assert(runOnce("warc_s1") === 2L)
    // second run, same checkpoint, nothing new: zero rows
    assert(runOnce("warc_s2") === 0L)
    // a NEW file lands; only it is processed
    writeFile(dir, "b.warc.gz", graft.sources.WarcFormat.gzipMember(rec(2, "response", "late file")))
    assert(runOnce("warc_s3") === 1L)
    // a seen file growing is refused, not silently re-read
    writeFile(dir, "a.warc",
      rec(0, "response", "batch one a") ++ rec(1, "response", "batch one b") ++
        rec(9, "response", "appended"))
    val e = intercept[Exception](runOnce("warc_s4"))
    assert(msgs(e).exists(_.contains("immutable")), msgs(e).mkString(" | "))
  }

  test("streaming offsets stay BOUNDED as lifetime file count grows (1000+ files)") {
    val dir = tmp()
    val ckpt = Files.createTempDirectory("warc_bound_ckpt").toString
    var total = 0L
    def runOnce(name: String): Long = {
      val seen = new java.util.concurrent.atomic.AtomicLong(0)
      val q = spark.readStream.format("warc").load(dir)
        .select("record_id")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          seen.addAndGet(b.count()); ()
        }
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      seen.get()
    }
    // three waves land 1050 files total; each wave is picked up exactly once
    var id = 0
    Seq(350, 350, 350).zipWithIndex.foreach { case (n, w) =>
      (0 until n).foreach { _ =>
        writeFile(dir, f"f$id%05d.warc", rec(id, "response", s"doc $id")); id += 1
      }
      assert(runOnce(s"warc_bound_$w") === n.toLong)
      total += n
    }
    // the committed offset JSON is a bounded pointer, NOT a 1050-entry
    // snapshot: every line of the newest Spark offset file stays tiny
    val offDir = Paths.get(ckpt, "offsets")
    val newest = Files.list(offDir).toArray.map(_.toString)
      .filter(_.split("/").last.forall(_.isDigit)) // skip .crc/.tmp sidecars
      .maxBy(_.split("/").last.toLong)
    // file layout: "v1", engine metadata (conf — engine-sized, not ours),
    // then one line per source holding the source's offset json
    val lines = new String(Files.readAllBytes(Paths.get(newest)), "UTF-8").split("\n")
    val srcOffset = lines.last
    assert(srcOffset.contains("\"v\":2"), lines.mkString(" | "))
    assert(srcOffset.length < 64,
      s"source offset grew with file count: ${srcOffset.length} bytes: $srcOffset")
    // a restart sees nothing new, then picks up exactly one late file
    assert(runOnce("warc_bound_r0") === 0L)
    writeFile(dir, "late.warc", rec(99999, "response", "late"))
    assert(runOnce("warc_bound_r1") === 1L)
  }

  test("seen-files log compacts: many batches leave a bounded log dir") {
    val dir = tmp()
    val ckpt = Files.createTempDirectory("warc_compact_ckpt").toString
    def runOnce(name: String): Long = {
      val seen = new java.util.concurrent.atomic.AtomicLong(0)
      val q = spark.readStream.format("warc").load(dir)
        .select("record_id")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          seen.addAndGet(b.count()); ()
        }
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      seen.get()
    }
    // 26 single-file batches cross the compaction interval twice
    (0 until 26).foreach { i =>
      writeFile(dir, f"g$i%03d.warc", rec(i, "response", s"doc $i"))
      assert(runOnce(s"warc_cp_$i") === 1L)
    }
    // the engine hands the source <ckpt>/sources/<i> as its location
    val logDir = new java.io.File(s"$ckpt/sources/0/graft-warc-files")
    val logFiles = logDir.listFiles().map(_.getName)
      .filter(n => n.forall(_.isDigit) || n.stripSuffix(".compact").forall(_.isDigit))
      .filterNot(_.startsWith(".")) // local-FS .crc sidecars
    // retention keeps: the latest compact + deltas past it (+ the next
    // compact's own delta) — far fewer than the 26 lifetime batches
    assert(logFiles.length <= graft.sources.WarcFileLog.CompactInterval + 4,
      s"log dir not compacted: ${logFiles.sorted.mkString(", ")}")
    assert(logFiles.count(_.endsWith(".compact")) >= 1)
    // a foreign file in the log dir must not wedge the stream
    Files.write(Paths.get(logDir.getPath, "old.compact"), "junk".getBytes("UTF-8"))
    Files.write(Paths.get(logDir.getPath, "README"), "junk".getBytes("UTF-8"))
    writeFile(dir, "g998.warc", rec(998, "response", "after junk"))
    assert(runOnce("warc_cp_junk") === 1L)
    // and the replayed seen-set still refuses a grown file
    writeFile(dir, "g000.warc", rec(0, "response", "doc 0") ++ rec(77, "response", "grown"))
    val e = intercept[Exception](runOnce("warc_cp_grow"))
    assert(msgs(e).exists(_.contains("immutable")), msgs(e).mkString(" | "))
  }

  test("recursiveFileLookup walks nested crawl layouts (batch + streaming)") {
    val dir = tmp()
    Files.createDirectories(Paths.get(dir, "segments", "seg0", "warc"))
    Files.createDirectories(Paths.get(dir, "segments", "seg1", "warc"))
    Files.write(Paths.get(dir, "segments", "seg0", "warc", "f0.warc"),
      rec(0, "response", "nested zero"))
    Files.write(Paths.get(dir, "segments", "seg1", "warc", "f1.warc.gz"),
      WarcFormat.gzipMember(rec(1, "response", "nested one")))
    // default stays flat: the error names the option
    val e = intercept[Exception](spark.read.format("warc").load(dir).count())
    assert(msgs(e).exists(_.contains("recursiveFileLookup")), msgs(e).mkString(" | "))
    val df = spark.read.format("warc").option("recursiveFileLookup", "true").load(dir)
    assert(df.count() === 2)
    assert(df.select("record_id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted === Array("<urn:uuid:rec-0>", "<urn:uuid:rec-1>"))
    // streaming honors the same option
    val ckpt = Files.createTempDirectory("warc_rec_ckpt").toString
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.format("warc").option("recursiveFileLookup", "true").load(dir)
      .select("record_id")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.addAndGet(b.count()); ()
      }
      .queryName("warc_rec_s")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(seen.get() === 2L)
    // a malformed option value fails with the option name
    val bad = intercept[Exception](
      spark.read.format("warc").option("recursiveFileLookup", "yes").load(dir).count())
    assert(msgs(bad).exists(_.contains("recursiveFileLookup")))
    val badBytes = intercept[Exception](
      spark.read.format("warc").option("maxPartitionBytes", "lots").load(dir).count())
    assert(msgs(badBytes).exists(_.contains("maxPartitionBytes")), msgs(badBytes).mkString(" | "))
  }

  test("torn gzip member fails loudly (not silent EOF), CRC verified") {
    // member 2 truncated inside its deflate data
    val m0 = WarcFormat.gzipMember(rec(0, "response", "first"))
    val m1 = WarcFormat.gzipMember(rec(1, "response", "second"))
    val dir = tmp()
    writeFile(dir, "t.warc.gz", m0 ++ m1.dropRight(12))
    val e = intercept[org.apache.spark.SparkException](
      spark.read.format("warc").load(dir).collect())
    assert(msgs(e).exists(m => m.contains("torn gzip") || m.contains("malformed gzip")),
      msgs(e).mkString(" | "))
    // garbage after a valid member: loud, not silently one record
    val dir2 = tmp()
    writeFile(dir2, "t.warc.gz", m0 ++ "garbage!".getBytes)
    val e2 = intercept[org.apache.spark.SparkException](
      spark.read.format("warc").load(dir2).collect())
    assert(msgs(e2).exists(_.contains("gzip")), msgs(e2).mkString(" | "))
    // a corrupted CRC byte inside an otherwise well-formed member: loud
    val dir3 = tmp()
    val broken = m0.clone(); broken(broken.length - 5) = (broken(broken.length - 5) ^ 0x7f).toByte
    writeFile(dir3, "t.warc.gz", broken)
    val e3 = intercept[org.apache.spark.SparkException](
      spark.read.format("warc").load(dir3).collect())
    assert(msgs(e3).exists(m => m.contains("CRC32") || m.contains("gzip")), msgs(e3).mkString(" | "))
  }

  test("torn record whose start falls in a later split fails loudly, not dropped") {
    val dir = tmp()
    val good = (0 until 6).map(i => rec(i, "response", s"payload $i " + ("z" * 200)))
    val torn = rec(9, "response", "x" * 300).take(40) // truncated mid-headers
    writeFile(dir, "t.warc", good.reduce(_ ++ _) ++ torn)
    // split small enough that the torn record's start lands in a k>0 split
    val e = intercept[org.apache.spark.SparkException](
      spark.read.format("warc").option("maxPartitionBytes", "512").load(dir).collect())
    assert(msgs(e).exists(_.contains("torn")), msgs(e).mkString(" | "))
    // unsplit read fails the same way — the two paths agree
    val e2 = intercept[org.apache.spark.SparkException](
      spark.read.format("warc").load(dir).collect())
    assert(msgs(e2).exists(_.contains("torn")), msgs(e2).mkString(" | "))
  }

  test("UTF-8 headers round trip; folded header lines parse; CRLF in value refused") {
    val dir = tmp()
    val uri = "http://example.com/café/日本/🦙"
    writeFile(dir, "u.warc",
      WarcFormat.buildRecord("response", "<urn:uuid:u>", uri,
        "2024-01-01T00:00:00Z", "text/plain", "body".getBytes("UTF-8")))
    val got = spark.read.format("warc").load(dir).head()
    assert(got.getAs[String]("target_uri") === uri)
    // ISO 28500 LWS folding: a continuation line joins the previous field
    val folded = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:f>\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Target-URI: http://example.com/long\r\n" +
      " /folded/tail\r\nContent-Length: 2\r\n\r\nok\r\n\r\n").getBytes("UTF-8")
    val dir2 = tmp()
    writeFile(dir2, "f.warc", folded)
    val got2 = spark.read.format("warc").load(dir2).head()
    assert(got2.getAs[String]("target_uri") === "http://example.com/long /folded/tail")
    assert(new String(got2.getAs[Array[Byte]]("payload"), "UTF-8") === "ok")
    // header-value injection refused at build
    intercept[IllegalArgumentException](
      WarcFormat.buildRecord("response", "<id>", "http://x/\r\nInjected: yes",
        "2024-01-01T00:00:00Z", "text/plain", Array.emptyByteArray))
  }

  test("review fixes: folded-first-line decoy, folded Content-Length, FHCRC, reserved FLG") {
    // a decoy whose first "header" line is FOLDED must be skipped by the
    // split sync (validatesAt mirrors parseRecord), not crash the read
    val decoy = "\r\n\r\nWARC/1.0\r\n x\r\nContent-Length: 0\r\n\r\n"
    val dir = tmp()
    val recs = (0 until 20).map(i => rec(i, "response", s"p $i $decoy " + ("q" * 120)))
    writeFile(dir, "a.warc", recs.reduce(_ ++ _))
    val got = spark.read.format("warc").option("maxPartitionBytes", "512").load(dir)
      .select("record_id").collect()
    assert(got.length === 20)
    // a folded continuation of Content-Length folds then fails toLong
    // loudly instead of silently replacing the framing length
    val foldedLen = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 4\r\n" +
      " 20\r\n\r\nbody\r\n\r\n").getBytes("UTF-8")
    val dir2 = tmp()
    writeFile(dir2, "f.warc", foldedLen)
    val e = intercept[org.apache.spark.SparkException](
      spark.read.format("warc").load(dir2).collect())
    assert(msgs(e).exists(_.contains("unparseable Content-Length")), msgs(e).mkString(" | "))
    // reserved FLG bits rejected precisely; FHCRC verified when present
    val member = WarcFormat.gzipMember(rec(0, "response", "x"))
    val dir3 = tmp()
    val badFlg = member.clone(); badFlg(3) = (badFlg(3) | 0x80).toByte
    writeFile(dir3, "r.warc.gz", badFlg)
    val e2 = intercept[org.apache.spark.SparkException](
      spark.read.format("warc").load(dir3).collect())
    assert(msgs(e2).exists(_.contains("reserved FLG")), msgs(e2).mkString(" | "))
    // member ordinal consistent between header-phase and data-phase errors
    val dir4 = tmp()
    writeFile(dir4, "t.warc.gz", member ++ member.take(14))
    val e3 = intercept[org.apache.spark.SparkException](
      spark.read.format("warc").load(dir4).collect())
    assert(msgs(e3).exists(_.contains("member 2")), msgs(e3).mkString(" | "))
  }

  test("headers map: extension headers, lowercase keys, folding, last wins") {
    val dir = tmp()
    val base = WarcFormat.buildRecord("revisit", "<urn:uuid:h-0>",
      "http://example.com/h/0", "2024-01-01T00:00:00Z", "text/plain",
      "x".getBytes("UTF-8"),
      extraHeaders = Seq(
        "WARC-Payload-Digest" -> "md5:abc",
        "WARC-Refers-To" -> "<urn:uuid:orig>",
        "X-Custom" -> "one"))
    // splice a folded continuation and a repeated header in by hand
    val txt = new String(base, "ISO-8859-1")
    val edited = txt.replace("X-Custom: one\r\n",
      "X-Custom: one\r\n two\r\nX-Again: a\r\nX-Again: b\r\n")
    writeFile(dir, "h.warc", edited.getBytes("ISO-8859-1"))
    val row = spark.read.format("warc").load(dir)
      .select(col("headers"), col("record_type")).collect()(0)
    val h = row.getAs[Map[String, String]]("headers")
    assert(h("warc-type") === "revisit") // names lowercased, std fields present
    assert(h("warc-payload-digest") === "md5:abc")
    assert(h("warc-refers-to") === "<urn:uuid:orig>")
    assert(h("x-custom") === "one two") // LWS folding joins with one space
    assert(h("x-again") === "b") // repeated header: last occurrence wins
    assert(h("content-length") === "1")
    // pruning: a query not selecting headers still works (map not built)
    assert(spark.read.format("warc").load(dir).select("record_id").count() === 1)
  }

  test("multiple files in a directory, deterministic union") {
    val dir = tmp()
    writeFile(dir, "a.warc", rec(0, "response", "from a"))
    writeFile(dir, "b.warc", rec(1, "response", "from b"))
    writeFile(dir, "c.warc.gz", WarcFormat.gzipMember(rec(2, "response", "from c")))
    writeFile(dir, "ignored.txt", "not warc".getBytes)
    val got = spark.read.format("warc").load(dir)
      .select("record_id").collect().map(_.getString(0)).sorted
    assert(got === Array("<urn:uuid:rec-0>", "<urn:uuid:rec-1>", "<urn:uuid:rec-2>"))
  }
}
