package graft.sources

import java.io.BufferedInputStream

import graft.io.SerializableHadoopConf
import org.apache.spark.sql.{DataFrame, functions => F}

/** CDX-driven SELECTIVE record fetch — the other half of the crawl-index
  * workflow ([[graft.text.TextAnalysis.parseCdxj]] is the first half):
  * production pipelines never scan 100 TB of archives to extract 1 TB;
  * they query the CDX sidecar for the (file, offset) rows they want and
  * issue RANGED reads that touch only those records.
  *
  * `fetch` takes a DataFrame of `(path string, offset long)` rows — the
  * shape a CDX join produces — and returns the standard WARC read schema
  * with exactly one record per input row. Offsets follow the CommonCrawl
  * CDX convention: for `.gz` archives the COMPRESSED byte offset of the
  * record's gzip member (each member decodes independently, via the same
  * CRC/ISIZE-verified walk as the full scan); for plain archives the raw
  * byte offset of the record. A wrong offset fails loudly through
  * [[WarcFormat.parseRecord]]'s framing checks (path + offset in the
  * message) — it cannot silently yield a neighboring record's bytes.
  *
  * Scale shape: the offset list stays DISTRIBUTED (a DataFrame, never a
  * driver-resident option string — a 1 TB selection over CommonCrawl is
  * tens of millions of rows), range-partitioned on (path, offset) so each
  * task owns a contiguous ascending run — one open stream per (task,
  * file), forward-only seeks, and a single hot archive splits across
  * tasks instead of skewing one. Bytes read are proportional to the
  * SELECTION, not the corpus (seek + one record each; BenchScale pins
  * this). `mapPartitions` rather than a DSv2 scan because the partition
  * list here is data-dependent — it IS the query's join output, which no
  * static `planInputPartitions` can see.
  */
object WarcFetch {

  /** One fetched record; `offset` echoes the REQUESTED offset so callers
    * can join results back to their CDX rows.
    */
  private[graft] final case class Fetched(
      path: String,
      offset: Long,
      record_id: String,
      record_type: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      payload: Array[Byte])

  /** close() shield: per-record decompressor wrappers must release their
    * native Inflater without closing the task's underlying file stream.
    */
  private final class NonClosing(in: java.io.InputStream)
      extends java.io.FilterInputStream(in) {
    override def close(): Unit = ()
  }

  def fetch(offsets: DataFrame): DataFrame = {
    val spark = offsets.sparkSession
    import spark.implicits._
    require(offsets.columns.contains("path") && offsets.columns.contains("offset"),
      s"warc fetch takes (path string, offset long) columns, got (${offsets.columns.mkString(", ")})")
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    offsets
      .select(F.col("path").cast("string"), F.col("offset").cast("long"))
      .repartitionByRange(F.col("path"), F.col("offset"))
      .sortWithinPartitions("path", "offset")
      .as[(String, java.lang.Long)] // boxed: null rows get a REAL error below
      .mapPartitions(it => new FetchIterator(it, conf))
      .toDF()
  }

  private final class FetchIterator(
      it: Iterator[(String, java.lang.Long)],
      conf: SerializableHadoopConf) extends Iterator[Fetched] {
    private var curPath: String = _
    private var raw: org.apache.hadoop.fs.FSDataInputStream = _

    // limit/early-exit downstream never reaches the exhaustion branch
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => closeRaw()))

    private def closeRaw(): Unit =
      if (raw != null) { raw.close(); raw = null; curPath = null }

    override def hasNext: Boolean = {
      val h = it.hasNext
      if (!h) closeRaw()
      h
    }

    override def next(): Fetched = {
      val (p, offBoxed) = it.next()
      if (p == null || offBoxed == null)
        throw new IllegalArgumentException(
          s"warc fetch: null ${if (p == null) "path" else "offset"} row " +
            "(a malformed CDX line parses to a null meta struct — filter " +
            "meta.url IS NOT NULL before the fetch)")
      val off = offBoxed.longValue()
      if (p != curPath) {
        closeRaw()
        val hp = new org.apache.hadoop.fs.Path(p)
        raw = hp.getFileSystem(conf.value).open(hp)
        curPath = p
      }
      raw.seek(off)
      val r =
        if (p.endsWith(".gz")) {
          val gz = new WarcFormat.MultiMemberGzipStream(
            new BufferedInputStream(new NonClosing(raw), 1 << 16), p)
          // inner framing errors report member-relative offsets; rethrow
          // with the REQUESTED compressed offset so a bad CDX row is
          // identifiable among millions
          try WarcFormat.parseRecord(
            new WarcFormat.PosStream(new BufferedInputStream(gz, 1 << 16), 0L),
            p, wantPayload = true, None)
          catch {
            case e: IllegalStateException => throw new IllegalStateException(
              s"warc fetch at compressed offset $off in $p: ${e.getMessage}", e)
          }
          finally gz.close() // frees the Inflater NOW; raw is shielded
        } else {
          WarcFormat.parseRecord(
            new WarcFormat.PosStream(new BufferedInputStream(new NonClosing(raw), 1 << 16), off),
            p, wantPayload = true, None)
        }
      Fetched(p, off, r.recordId, r.recordType, r.targetUri, r.warcDate,
        r.contentType, r.contentLength, r.payload)
    }
  }
}
