package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}

import graft.io.SerializableHadoopConf
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** WARC/WET ingestion as a DataSource V2 table (ISO 28500 — the format
  * every web-scale corpus arrives in):
  *
  *   spark.read.format("warc").load(dirOrFile)
  *   // (path, offset, record_id, record_type, target_uri, warc_date,
  *   //  content_type, content_length, payload binary,
  *   //  headers map<string,string>)
  *
  * This is the ingest frontier in front of
  * [[graft.text.TextAnalysis.extractMarkup]] → `c4CleanLines` → dedup:
  * raw crawl archives become a relational scan with the planner's usual
  * levers —
  *
  *  - **Column pruning pushes down**: a headers-only projection (audits,
  *    URL frontier work) never materializes payload bytes — the reader
  *    `skip`s `Content-Length` bytes instead of reading them.
  *  - **record_type predicate pushes down** (`EqualTo`/`In`): a
  *    `WHERE record_type = 'response'` scan skims non-matching records'
  *    headers and skips their payloads; the filter shows under
  *    `PushedFilters` in explain.
  *  - **Record-boundary splitting** for UNCOMPRESSED archives: a split
  *    [start, end) syncs to the first VALIDATED record boundary at or
  *    after `start` (separator scan for `\r\n\r\nWARC/` + a full header
  *    block parse with a sane Content-Length — a payload that merely
  *    embeds the magic bytes fails validation and is skipped) and reads
  *    records whose start offset lies in [start, end), running past
  *    `end` to finish the last one — parquet's split convention. A
  *    payload embedding a COMPLETE valid WARC record is indistinguishable
  *    to any index-free splitter; archives carrying archives should
  *    disable splitting (`.option("maxPartitionBytes", <fileLen>)`) or
  *    use the gzip form.
  *  - **gzip member-per-record** (`.warc.gz`/`.wet.gz`, the CommonCrawl
  *    layout): one file = one partition (gzip members are not seekable
  *    without an index); a member-verifying walk
  *    ([[WarcFormat.MultiMemberGzipStream]] — `java.util.zip.GZIPInputStream`
  *    would treat a torn next member as silent EOF) decodes the
  *    concatenated members, checking each header (magic, method,
  *    reserved FLG bits, optional FHCRC) and each trailer's CRC32 +
  *    ISIZE; `offset` reports UNCOMPRESSED positions.
  *    Parallelism comes from file count — crawl dumps ship thousands of
  *    ~1 GB segments, so a 1000-executor cluster saturates on files, not
  *    splits.
  *
  * Framing is trusted but VERIFIED: every record must present a
  * `WARC/` version line, a CRLF-terminated header block with a parseable
  * `Content-Length`, exactly that many payload bytes, and the two
  * trailing CRLFs — a torn/truncated record (mid-headers EOF, short
  * payload, missing trailer) fails the task loudly with path + offset
  * instead of emitting a silently partial table.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.schema

  // the WRITE schema is the incoming frame's (payload + optional header
  // columns) — narrower than the read schema (path/offset/content_length
  // are read products), so the provider accepts external metadata and
  // validates it in newWriteBuilder
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "warc source requires a path: spark.read.format(\"warc\").load(dirOrFile)"))
    // reads resolve with the inferred schema; writes hand the incoming
    // frame's (narrower) schema through here — the table must echo it
    // back or Spark demands read-product columns from the writer
    new WarcTable(path, schema)
  }
}

object WarcDataSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("record_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    // ALL WARC headers (names lowercased, LWS folding applied, last
    // occurrence wins) — surfaces the extension fields the fixed columns
    // don't (WARC-Refers-To / WARC-Payload-Digest for revisit-record
    // dedup, WARC-Truncated, WARC-IP-Address, ...). Pruned like any
    // column: a query not selecting it pays nothing
    StructField("headers", MapType(StringType, StringType), nullable = true)))
}

private[sources] class WarcTable(path: String, tableSchema: StructType) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"warc:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxPartitionBytes = Option(options.get("maxPartitionBytes")).map { v =>
      try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"warc option maxPartitionBytes must be a byte count, got '$v'")
      }
    }.getOrElse(128L << 20)
    // Spark's file-source option name: crawl dumps nest
    // (segments/*/warc/*.warc.gz), so a directory load can walk the tree
    val recursive = Option(options.get("recursiveFileLookup")).exists { v =>
      v.toLowerCase(java.util.Locale.ROOT) match {
        case "true" => true
        case "false" => false
        case other => throw new IllegalArgumentException(
          s"warc option recursiveFileLookup must be true or false, got '$other'")
      }
    }
    new WarcScanBuilder(path, maxPartitionBytes, recursive)
  }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val s = info.schema()
    val allowed = Set("record_type", "record_id", "target_uri", "warc_date",
      "content_type", "payload")
    val extra = s.fieldNames.filterNot(allowed)
    require(extra.isEmpty,
      s"warc write takes (payload binary[, record_type, record_id, target_uri, " +
        s"warc_date, content_type string]) — unexpected column(s) ${extra.mkString(", ")} " +
        "(path/offset/content_length are read products; project the rest away)")
    require(s.fieldNames.contains("payload") &&
        s.find(_.name == "payload").get.dataType == BinaryType,
      "warc write needs payload: binary — encode(text, 'UTF-8') a string column first")
    s.fields.filter(_.name != "payload").foreach(f =>
      require(f.dataType == StringType,
        s"warc write header column ${f.name} must be string, got ${f.dataType.catalogString}"))
    new WarcWriteBuilder(path, s, info.options(), truncate = false)
  }
}

private[sources] class WarcScanBuilder(path: String, maxPartitionBytes: Long, recursive: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  require(maxPartitionBytes > 0, s"maxPartitionBytes must be positive, got $maxPartitionBytes")
  private var required: StructType = WarcDataSource.schema
  private var pushed: Array[Filter] = Array.empty
  // None = no type constraint; Some(set) = record_type must be in set
  private var types: Option[Set[String]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(WarcDataSource.schema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("record_type", _: String) => true
      case In("record_type", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    accepted.foreach {
      case EqualTo(_, v: String) => intersect(Set(v))
      case In(_, vs) => intersect(vs.map(_.asInstanceOf[String]).toSet)
      case _ => ()
    }
    pushed = accepted
    rest
  }
  private def intersect(s: Set[String]): Unit =
    types = Some(types.fold(s)(_ intersect s))

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new WarcScan(path, required, types, maxPartitionBytes, recursive)
}

private[sources] class WarcScan(
    path: String,
    required: StructType,
    types: Option[Set[String]],
    maxPartitionBytes: Long,
    recursive: Boolean) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"warc:$path${types.fold("")(t => s" [record_type in ${t.toSeq.sorted.mkString(",")}]")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val files = WarcScan.listFiles(path, spark.sparkContext.hadoopConfiguration, recursive)
    require(files.nonEmpty,
      s"no WARC files under $path (expected ${WarcScan.Extensions.mkString("/")}; " +
        "nested crawl layouts need .option(\"recursiveFileLookup\", \"true\"))")
    WarcScan.planFiles(files, maxPartitionBytes)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    new WarcReaderFactory(required.fieldNames, types.map(_.toArray.sorted),
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
  }

  /** `readStream.format("warc")` — continuous crawl ingest: each
    * micro-batch processes the files that appeared since the last offset.
    * The SEEN-FILE SET (name → length) lives in a compacted log under the
    * query's checkpoint ([[WarcFileLog]]) and the offset JSON is a
    * bounded pointer into it, so neither checkpoint commits nor log file
    * count grow with lifetime file count; no name-monotonicity or mtime
    * assumption is needed — a file landing with any name is picked up
    * exactly once, and a restart replans the committed set's complement.
    * WARC files must be immutable once visible (the crawl-dump contract):
    * a grown file is detected at the next offset and REFUSED rather than
    * silently re-read or half-read.
    */
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcMicroBatchStream(path, required, types, maxPartitionBytes, recursive,
      checkpointLocation)
}

private[sources] object WarcScan {
  val Extensions: Seq[String] = Seq(".warc", ".wet", ".warc.gz", ".wet.gz")

  def listFiles(
      path: String,
      hconf: org.apache.hadoop.conf.Configuration,
      recursive: Boolean = false): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val st = fs.getFileStatus(p)
    if (st.isDirectory) {
      val out = Seq.newBuilder[(String, Long)]
      def walk(dir: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(dir).foreach { s =>
          if (s.isFile) {
            val n = s.getPath.toString
            if (Extensions.exists(n.endsWith)) out += ((n, s.getLen))
          } else if (recursive && s.isDirectory) walk(s.getPath)
        }
      walk(p)
      out.result().sortBy(_._1)
    } else Seq((fs.makeQualified(p).toString, st.getLen))
  }

  def planFiles(files: Seq[(String, Long)], maxPartitionBytes: Long): Array[InputPartition] =
    files.flatMap { case (f, len) =>
      if (f.endsWith(".gz")) Seq(WarcInputPartition(f, 0L, Long.MaxValue, gz = true))
      else {
        // record-boundary splits: [k·M, (k+1)·M), reader syncs + overruns
        val n = math.max(1L, (len + maxPartitionBytes - 1) / maxPartitionBytes)
        (0L until n).map(k => WarcInputPartition(
          f, k * maxPartitionBytes, math.min(len, (k + 1) * maxPartitionBytes), gz = false))
      }
    }.toArray
}

/** LEGACY (v1) offset = the full set of (file, length) visible at
  * snapshot time, `{"v":1,"files":["<len>|<escaped name>", ...]}` sorted
  * by name. Still parsed so pre-compaction checkpoints resume; new
  * batches write bounded [[WarcLogOffset]]s (the full snapshot grew with
  * LIFETIME file count — a multi-MB JSON per commit at crawl-dump scale).
  */
private[graft] case class WarcOffset(files: Map[String, Long])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    files.toSeq.sortBy(_._1)
      .map { case (n, l) => "\"" + l + "|" + WarcOffset.esc(n) + "\"" }
      .mkString("{\"v\":1,\"files\":[", ",", "]}")
}

private[graft] object WarcOffset {
  private[sources] def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Inverse of [[esc]] applied to one `<len>|<escaped name>` entry. */
  private[sources] def parseEntry(e: String): (String, Long) = {
    val i = e.indexOf('|')
    require(i > 0, s"malformed warc offset entry: $e")
    val name = new StringBuilder
    var j = i + 1
    while (j < e.length) {
      val c = e.charAt(j)
      if (c == '\\' && j + 1 < e.length) {
        e.charAt(j + 1) match {
          case '"' => name += '"'; j += 2
          case '\\' => name += '\\'; j += 2
          case 'u' => name += Integer.parseInt(e.substring(j + 2, j + 6), 16).toChar; j += 6
          case other => name += other; j += 2
        }
      } else { name += c; j += 1 }
    }
    name.toString -> e.substring(0, i).toLong
  }

  def fromJson(json: String): WarcOffset = {
    // entries are "<len>|<escaped name>" inside a flat JSON string array;
    // names never contain unescaped quotes, so quote-split is exact
    val body = json.trim.stripPrefix("{\"v\":1,\"files\":[").stripSuffix("]}")
    if (body.isEmpty) return WarcOffset(Map.empty)
    val entries = body.split("\",\"").map(_.stripPrefix("\"").stripSuffix("\""))
    WarcOffset(entries.map(parseEntry).toMap)
  }
}

/** v2 offset: a BOUNDED pointer into the checkpoint-resident seen-files
  * log ([[WarcFileLog]]) — `{"v":2,"log":<batchId>}`, constant-size no
  * matter how many files the stream has ever ingested. `-1` = nothing
  * seen yet.
  */
private[graft] case class WarcLogOffset(batchId: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"v":2,"log":$batchId}"""
}

private[graft] object WarcLogOffset {
  private val LogField = "\"log\":(-?\\d+)".r
  def fromJson(json: String): WarcLogOffset =
    WarcLogOffset(LogField.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(
      throw new IllegalArgumentException(s"malformed warc v2 offset: $json")))
}

/** The seen-files log backing [[WarcLogOffset]] — the same shape Spark's
  * own FileStreamSource keeps: per batch a DELTA file listing the files
  * that batch ingested, and every [[WarcFileLog.CompactInterval]] batches
  * additionally a `.compact` file holding the FULL seen set, after which
  * `retain` drops the superseded deltas. Resolving an offset reads one
  * compact file + the deltas past it, so both checkpoint JSON size and
  * log file count stay bounded for the stream's lifetime. Files are
  * written by the DRIVER only (latestOffset), via temp + rename.
  *
  * Entry lines reuse the v1 offset escaping (`<len>|<escaped name>`).
  */
private[graft] class WarcFileLog(
    dir: String, hconf: org.apache.hadoop.conf.Configuration) {
  import java.nio.charset.StandardCharsets.UTF_8

  private def deltaPath(b: Long) = f"$dir/$b%020d"
  private def compactPath(b: Long) = f"$dir/$b%020d.compact"

  /** (batchId, isCompact) pairs present in the log, sorted by batch. */
  def list(): Seq[(Long, Boolean)] =
    if (!graft.io.HadoopIO.exists(dir, hconf)) Seq.empty
    else {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(hconf).listStatus(p).toSeq.filter(_.isFile)
        .map(_.getPath.getName)
        .filterNot(_.endsWith(".inprogress"))
        .flatMap { n =>
          // both forms digit-guarded: one foreign file (editor backup,
          // .crc sidecar) must not wedge every list()-caller forever
          val base = n.stripSuffix(".compact")
          if (base.nonEmpty && base.forall(_.isDigit))
            Some((base.toLong, n.endsWith(".compact")))
          else None
        }
        .sorted
    }

  def maxBatch(): Long = list().map(_._1).foldLeft(-1L)(math.max)

  def write(batchId: Long, entries: Seq[(String, Long)], compact: Boolean): Unit = {
    graft.io.HadoopIO.mkdirs(dir, hconf)
    val path = if (compact) compactPath(batchId) else deltaPath(batchId)
    graft.io.HadoopIO.write(path, hconf) { out =>
      entries.sortBy(_._1).foreach { case (n, l) =>
        out.write(s"$l|${WarcOffset.esc(n)}\n".getBytes(UTF_8))
      }
    }
  }

  private def read(batchId: Long, compact: Boolean): Seq[(String, Long)] = {
    val path = if (compact) compactPath(batchId) else deltaPath(batchId)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), UTF_8))
    try Iterator.continually(in.readLine()).takeWhile(_ != null)
      .filter(_.nonEmpty).map(WarcOffset.parseEntry).toVector
    finally in.close()
  }

  /** The full seen set as of `batchId`: latest compact ≤ batchId plus
    * every delta after it. A missing delta means the checkpoint is
    * foreign or was manually pruned — fail loudly, never re-ingest.
    */
  def resolve(batchId: Long): Map[String, Long] = {
    if (batchId < 0) return Map.empty
    val present = list().filter(_._1 <= batchId)
    require(present.exists(_._1 == batchId),
      s"warc stream: seen-files log $dir has no entry for batch $batchId — " +
        "the checkpoint's sources/ and graft-warc-files/ must travel together")
    val compactId = present.filter(_._2).map(_._1).foldLeft(-1L)(math.max)
    val base =
      if (compactId < 0) Map.empty[String, Long]
      else read(compactId, compact = true).toMap
    val deltaIds = present.collect { case (b, false) if b > compactId => b }
    deltaIds.foldLeft(base)((acc, b) => acc ++ read(b, compact = false))
  }

  /** Drop deltas superseded by a compact at or before `committed` (and
    * compacts older than that compact) — what keeps log file count
    * bounded. Deltas AFTER the compact stay: a restart replans
    * `(committed, lastPlanned]` from them.
    */
  def retain(committed: Long): Unit = {
    val entries = list()
    val compactId = entries.filter { case (b, c) => c && b <= committed }
      .map(_._1).foldLeft(-1L)(math.max)
    if (compactId < 0) return
    entries.foreach {
      case (b, false) if b <= compactId =>
        graft.io.HadoopIO.delete(deltaPath(b), hconf)
      case (b, true) if b < compactId =>
        graft.io.HadoopIO.delete(compactPath(b), hconf)
      case _ => ()
    }
  }
}

private[graft] object WarcFileLog {
  val CompactInterval = 10
}

private[sources] class WarcMicroBatchStream(
    path: String,
    required: StructType,
    types: Option[Set[String]],
    maxPartitionBytes: Long,
    recursive: Boolean,
    checkpointLocation: String)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val hconf = org.apache.spark.sql.SparkSession.active
    .sparkContext.hadoopConfiguration
  private val log = new WarcFileLog(s"$checkpointLocation/graft-warc-files", hconf)
  // replay the log so a restarted query neither re-ingests a seen file
  // nor re-assigns an already-logged batch id
  private var currentBatch: Long = log.maxBatch()
  private var seen: Map[String, Long] = log.resolve(currentBatch)

  override def initialOffset(): Offset = WarcLogOffset(-1L)

  override def latestOffset(): Offset = synchronized {
    val listed = WarcScan.listFiles(path, hconf, recursive)
    listed.foreach { case (n, l) =>
      seen.get(n).foreach(l0 => require(l0 == l,
        s"warc stream: $n changed length $l0 → $l — WARC inputs must be " +
          "immutable once visible; write to a temp name and rename into place"))
    }
    val fresh = listed.filterNot { case (n, _) => seen.contains(n) }
    if (fresh.isEmpty) WarcLogOffset(currentBatch)
    else {
      val next = currentBatch + 1
      log.write(next, fresh, compact = false)
      seen = seen ++ fresh
      if (next % WarcFileLog.CompactInterval == 0)
        log.write(next, seen.toSeq, compact = true)
      currentBatch = next
      WarcLogOffset(next)
    }
  }

  override def deserializeOffset(json: String): Offset =
    if (json.contains("\"v\":2")) WarcLogOffset.fromJson(json)
    else WarcOffset.fromJson(json) // legacy full-snapshot checkpoints

  // planInputPartitions resolves (start, end) EVERY batch; without a
  // cache that is two full log reads per batch — O(lifetime file count)
  // of checkpoint I/O, forever. The in-memory `seen` map IS resolve(
  // currentBatch) (the steady-state `end`), and the last off-current
  // resolution (the steady-state `start` = previous end) is memoized.
  private var resolveCache: (Long, Map[String, Long]) = _

  private def resolve(o: Offset): Map[String, Long] = o match {
    case WarcLogOffset(b) => synchronized {
      if (b == currentBatch) seen
      else if (resolveCache != null && resolveCache._1 == b) resolveCache._2
      else {
        val m = log.resolve(b)
        resolveCache = (b, m)
        m
      }
    }
    case WarcOffset(files) => files
    case other => throw new IllegalStateException(s"unexpected warc offset: $other")
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = resolve(start)
    val e = resolve(end)
    s.foreach { case (n, l) =>
      e.get(n).foreach(l2 => require(l2 == l,
        s"warc stream: $n changed length $l → $l2 — WARC inputs must be " +
          "immutable once visible; write to a temp name and rename into place"))
    }
    val fresh = e.toSeq.filterNot { case (n, _) => s.contains(n) }.sortBy(_._1)
    WarcScan.planFiles(fresh, maxPartitionBytes)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required.fieldNames, types.map(_.toArray.sorted),
      new SerializableHadoopConf(hconf))

  override def commit(end: Offset): Unit = end match {
    case WarcLogOffset(b) if b >= 0 => log.retain(b)
    case _ => ()
  }
  override def stop(): Unit = ()
}

private[sources] case class WarcInputPartition(
    path: String, start: Long, end: Long, gz: Boolean) extends InputPartition

private[sources] class WarcReaderFactory(
    fields: Array[String],
    types: Option[Array[String]],
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(partition.asInstanceOf[WarcInputPartition],
      fields, types.map(_.toSet), conf)
}

private[sources] class WarcPartitionReader(
    partition: WarcInputPartition,
    fields: Array[String],
    types: Option[Set[String]],
    conf: SerializableHadoopConf) extends PartitionReader[InternalRow] {

  private val hPath = new org.apache.hadoop.fs.Path(partition.path)
  private val fs = hPath.getFileSystem(conf.value)
  private val raw = fs.open(hPath)
  private val wantPayload = fields.contains("payload")
  private val wantHeaders = fields.contains("headers")
  private val pathUtf8 = UTF8String.fromString(partition.path)

  private var in: WarcFormat.PosStream = _
  private var exhausted = false
  private var current: WarcFormat.Record = _
  // what close() must release — for gz this is the decompressor (whose
  // close() frees the Inflater's native memory NOW and closes raw);
  // GC-finalizer release would pool one Inflater per task off-heap
  private var toClose: java.io.Closeable = raw

  // gz: whole file, uncompressed offsets; plain: seek + boundary sync
  if (partition.gz) {
    val gz = new WarcFormat.MultiMemberGzipStream(
      new BufferedInputStream(raw, 1 << 16), partition.path)
    toClose = gz
    in = new WarcFormat.PosStream(new BufferedInputStream(gz, 1 << 16), 0L)
  } else if (partition.start == 0L) {
    in = new WarcFormat.PosStream(new BufferedInputStream(raw, 1 << 16), 0L)
  } else {
    WarcFormat.sync(raw, partition.start, partition.end, partition.path) match {
      case Some(boundary) =>
        raw.seek(boundary)
        in = new WarcFormat.PosStream(new BufferedInputStream(raw, 1 << 16), boundary)
      case None => exhausted = true // no record starts in this split
    }
  }

  override def next(): Boolean = {
    while (!exhausted) {
      // records belong to the split that contains their START offset (a
      // type-filtered skim must stop here too, or the next split would
      // emit the same records again)
      if ((!partition.gz && in.pos >= partition.end) || in.atEof) {
        exhausted = true
        return false
      }
      val r = WarcFormat.parseRecord(in, partition.path, wantPayload, types, wantHeaders)
      if (r.matched) { current = r; return true }
      // non-matching record: consumed (headers skimmed, payload skipped),
      // loop for the next one
    }
    false
  }

  override def get(): InternalRow = {
    val out = new GenericInternalRow(fields.length)
    var i = 0
    while (i < fields.length) {
      fields(i) match {
        case "path" => out.update(i, pathUtf8)
        case "offset" => out.setLong(i, current.offset)
        case "record_id" => out.update(i, WarcFormat.utf8OrNull(current.recordId))
        case "record_type" => out.update(i, WarcFormat.utf8OrNull(current.recordType))
        case "target_uri" => out.update(i, WarcFormat.utf8OrNull(current.targetUri))
        case "warc_date" => out.update(i, WarcFormat.utf8OrNull(current.warcDate))
        case "content_type" => out.update(i, WarcFormat.utf8OrNull(current.contentType))
        case "content_length" => out.setLong(i, current.contentLength)
        case "payload" => out.update(i, current.payload)
        case "headers" =>
          val h = current.headers
          out.update(i, new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              h.keys.toArray.map(k => UTF8String.fromString(k): Any)),
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              h.values.toArray.map(v => UTF8String.fromString(v): Any))))
      }
      i += 1
    }
    out
  }

  override def close(): Unit = toClose.close()
}

/** ISO 28500 framing: build + parse + split-boundary sync. Shared by the
  * reader, the fixture synthesis in `warc_ingest`, and WarcSourceSpec.
  */
object WarcFormat {
  private val Crlf = "\r\n"
  /** Reject absurd header blocks instead of buffering them (a torn file
    * whose "headers" never terminate must not OOM the task).
    */
  private val MaxHeaderBytes = 1 << 20

  /** One serialized WARC record (version line, headers, CRLF, payload,
    * CRLF CRLF) — the fixture builder for tests and the `warc_ingest`
    * row, and the shape [[parseRecord]] inverts.
    */
  def buildRecord(
      recordType: String,
      recordId: String,
      targetUri: String,
      date: String,
      contentType: String,
      payload: Array[Byte],
      extraHeaders: Seq[(String, String)] = Seq.empty): Array[Byte] = {
    // a CR/LF inside a header value would tear the framing for every
    // record after it — refuse at build, not at some later read
    (Seq(recordType, recordId, targetUri, date, contentType) ++
      extraHeaders.flatMap { case (n, v) => Seq(n, v) })
      .filter(_ != null).foreach(v =>
        require(!v.exists(c => c == '\r' || c == '\n'),
          s"WARC header value must not contain CR/LF: '${v.take(64)}'"))
    val sb = new StringBuilder
    sb ++= "WARC/1.0" ++= Crlf
    sb ++= s"WARC-Type: $recordType" ++= Crlf
    sb ++= s"WARC-Record-ID: $recordId" ++= Crlf
    sb ++= s"WARC-Date: $date" ++= Crlf
    if (targetUri != null) sb ++= s"WARC-Target-URI: $targetUri" ++= Crlf
    sb ++= s"Content-Type: $contentType" ++= Crlf
    // extension headers (WARC-Refers-To, WARC-Payload-Digest, ...)
    extraHeaders.foreach { case (n, v) => sb ++= s"$n: $v" ++= Crlf }
    sb ++= s"Content-Length: ${payload.length}" ++= Crlf
    sb ++= Crlf
    // UTF-8 per ISO 28500 (Latin-1 would silently '?' any header char
    // above U+00FF — a CJK IRI in target_uri must round-trip)
    val head = sb.result().getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** One gzip MEMBER holding exactly `bytes` — concatenate members for
    * the CommonCrawl `.warc.gz` record-per-member layout.
    */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  final case class Record(
      offset: Long,
      recordId: String,
      recordType: String,
      targetUri: String,
      warcDate: String,
      contentType: String,
      contentLength: Long,
      payload: Array[Byte], // null when pruned or type-filtered away
      matched: Boolean, // false = consumed only to advance the stream
      headers: Map[String, String]) // null unless requested (column pruned)

  /** Position-tracking buffered byte source with 1-byte lookahead. */
  final class PosStream(in: InputStream, startPos: Long) {
    var pos: Long = startPos
    /** BYTE length of the last [[readLine]] line (incl. its CRLF) — the
      * header-BLOCK bound must count bytes, not decoded UTF-8 chars.
      */
    var lastLineBytes: Int = 0
    private var peeked: Int = -2
    def read(): Int = {
      if (peeked != -2) { val b = peeked; peeked = -2; if (b >= 0) pos += 1; return b }
      val b = in.read()
      if (b >= 0) pos += 1
      b
    }
    def atEof: Boolean = {
      if (peeked == -2) peeked = in.read()
      peeked == -1
    }
    def readFully(buf: Array[Byte], len: Int, path: String, what: String): Unit = {
      var off = 0
      if (peeked >= 0 && len > 0) { buf(0) = peeked.toByte; peeked = -2; pos += 1; off = 1 }
      while (off < len) {
        val n = in.read(buf, off, len - off)
        if (n < 0) throw new TornEofException(
          s"torn WARC record: $path: EOF after $off of $len $what bytes at offset $pos")
        off += n; pos += n
      }
    }
    def skipFully(len: Long, path: String, what: String): Unit = {
      var remaining = len
      if (peeked >= 0 && remaining > 0) { peeked = -2; pos += 1; remaining -= 1 }
      while (remaining > 0) {
        val n = in.skip(remaining)
        if (n <= 0) {
          if (in.read() < 0) throw new TornEofException(
            s"torn WARC record: $path: EOF with $remaining of $len $what bytes unskipped at offset $pos")
          pos += 1; remaining -= 1
        } else { pos += n; remaining -= n }
      }
    }
  }

  /** EOF where record bytes were still owed — the signal that
    * distinguishes a genuinely TORN tail from payload noise during
    * split-boundary validation (a decoy candidate fails with a malformed
    * line while bytes remain; a truncated record runs out of file).
    */
  final class TornEofException(msg: String) extends IllegalStateException(msg)

  /** Concatenated-member gzip reader with LOUD torn-member detection —
    * `java.util.zip.GZIPInputStream` silently treats a malformed or
    * truncated next member header as end-of-stream, which would turn a
    * torn `.warc.gz` into a silently partial table. This walk parses each
    * member header itself (magic, CM=8, FEXTRA/FNAME/FCOMMENT/FHCRC),
    * inflates with a raw `Inflater(nowrap)`, and VERIFIES the member
    * trailer (CRC32 + ISIZE) — truncation or garbage anywhere throws
    * [[TornEofException]]/IllegalStateException with the member ordinal.
    * `close()` releases the Inflater's native memory deterministically
    * (no finalizer dependence — thousands of per-task Inflaters would
    * otherwise pool off-heap until GC).
    */
  final class MultiMemberGzipStream(in: InputStream, path: String) extends InputStream {
    private val bin = in
    private val inf = new java.util.zip.Inflater(true)
    private val crc = new java.util.zip.CRC32
    private val feed = new Array[Byte](1 << 16)
    // bytes the inflater over-read past a member end (trailer + next header)
    private var pending: Array[Byte] = Array.emptyByteArray
    private var pendingOff = 0
    private var memberOpen = false
    private var memberBytes = 0L
    private var member = 0
    private var done = false
    private val one = new Array[Byte](1)

    private def torn(what: String) = new TornEofException(
      s"torn gzip member $member in $path: EOF in $what")
    private def malformed(what: String) = new IllegalStateException(
      s"malformed gzip member $member in $path: $what")

    private def rawRead(): Int =
      if (pendingOff < pending.length) { val b = pending(pendingOff) & 0xff; pendingOff += 1; b }
      else bin.read()

    private def rawReadFully(n: Int, what: String): Array[Byte] = {
      val a = new Array[Byte](n)
      var o = 0
      while (o < n) { val b = rawRead(); if (b < 0) throw torn(what); a(o) = b.toByte; o += 1 }
      a
    }

    /** Parse one member header; false = clean EOF before any byte. */
    private def startMember(): Boolean = {
      val b0 = rawRead()
      if (b0 < 0) return false
      member += 1 // ordinal consistent across header/deflate/trailer errors
      // record the header bytes: FHCRC (when present) covers everything
      // from the magic through the last optional field
      val rec = new java.io.ByteArrayOutputStream(32)
      rec.write(b0)
      def r1(what: String): Int = {
        val b = rawRead(); if (b < 0) throw torn(what); rec.write(b); b
      }
      def rn(n: Int, what: String): Array[Byte] = {
        val a = new Array[Byte](n)
        var o = 0
        while (o < n) { a(o) = r1(what).toByte; o += 1 }
        a
      }
      val b1 = r1("gzip magic")
      if (b0 != 0x1f || b1 != 0x8b) throw malformed(f"bad magic $b0%02x $b1%02x")
      val hdr = rn(8, "gzip header")
      if (hdr(0) != 8) throw malformed(s"compression method ${hdr(0)} (want 8=deflate)")
      val flg = hdr(1) & 0xff
      // reserved bits imply header fields this parser doesn't know —
      // reject precisely (as the JDK reader did) instead of misaligning
      // into the deflate data and failing with a misleading CRC error
      if ((flg & 0xe0) != 0) throw malformed(f"reserved FLG bits set: $flg%02x")
      if ((flg & 0x04) != 0) { // FEXTRA
        val x = rn(2, "FEXTRA length")
        val xlen = (x(0) & 0xff) | ((x(1) & 0xff) << 8)
        rn(xlen, "FEXTRA")
      }
      if ((flg & 0x08) != 0) { var b = r1("FNAME"); while (b != 0) b = r1("FNAME") }
      if ((flg & 0x10) != 0) { var b = r1("FCOMMENT"); while (b != 0) b = r1("FCOMMENT") }
      if ((flg & 0x02) != 0) { // FHCRC: low 16 bits of CRC32 over the header
        val want = {
          val c = new java.util.zip.CRC32
          val h = rec.toByteArray
          c.update(h, 0, h.length)
          (c.getValue & 0xffffL).toInt
        }
        val lo = rawRead(); val hi = rawRead()
        if (lo < 0 || hi < 0) throw torn("FHCRC")
        val got = (lo & 0xff) | ((hi & 0xff) << 8)
        if (got != want)
          throw malformed(f"FHCRC mismatch: header crc16 $got%04x vs computed $want%04x")
      }
      inf.reset()
      crc.reset()
      memberBytes = 0L
      memberOpen = true
      true
    }

    private def feedInflater(): Unit = {
      var n = 0
      // drain over-read bytes first, then the stream (bulk)
      while (n < feed.length && pendingOff < pending.length) {
        feed(n) = pending(pendingOff); pendingOff += 1; n += 1
      }
      if (n == 0) {
        val r = bin.read(feed, 0, feed.length)
        if (r < 0) throw torn("deflate data")
        n = r
      }
      lastFeedLen = n
      inf.setInput(feed, 0, n)
    }

    private def finishMember(): Unit = {
      // reclaim what the inflater over-read: the suffix of the last feed
      // (trailer bytes + whatever follows — the next member's header)
      val rem = inf.getRemaining
      if (rem > 0) {
        val keep = new Array[Byte](rem + (pending.length - pendingOff))
        System.arraycopy(feed, lastFeedLen - rem, keep, 0, rem)
        System.arraycopy(pending, pendingOff, keep, rem, pending.length - pendingOff)
        pending = keep
        pendingOff = 0
      }
      val tr = rawReadFully(8, "gzip trailer")
      def le32(o: Int): Long =
        (tr(o) & 0xffL) | ((tr(o + 1) & 0xffL) << 8) |
          ((tr(o + 2) & 0xffL) << 16) | ((tr(o + 3) & 0xffL) << 24)
      if (le32(0) != crc.getValue)
        throw malformed(f"CRC32 mismatch: trailer ${le32(0)}%08x vs computed ${crc.getValue}%08x")
      if (le32(4) != (memberBytes & 0xffffffffL))
        throw malformed(s"ISIZE mismatch: trailer ${le32(4)} vs inflated ${memberBytes & 0xffffffffL}")
      memberOpen = false
    }

    private var lastFeedLen = 0

    override def read(): Int = {
      val n = read(one, 0, 1)
      if (n < 0) -1 else one(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (true) {
        if (done) return -1
        if (!memberOpen) {
          if (!startMember()) { done = true; return -1 }
        }
        if (!inf.finished() && inf.needsInput()) feedInflater()
        val w =
          try inf.inflate(b, off, len)
          catch { case e: java.util.zip.DataFormatException =>
            throw malformed(s"corrupt deflate data: ${e.getMessage}") }
        if (w > 0) { crc.update(b, off, w); memberBytes += w; return w }
        if (inf.finished()) finishMember()
        else if (inf.needsDictionary()) throw malformed("preset dictionary demanded")
      }
      -1 // unreachable
    }

    override def close(): Unit = {
      inf.end() // release native memory NOW, not at finalization
      bin.close()
    }
  }

  /** One CRLF-terminated header line, decoded as UTF-8 (ISO 28500
    * mandates UTF-8 header content — byte-per-char Latin-1 would mojibake
    * a non-ASCII WARC-Target-URI).
    */
  private def readLine(in: PosStream, path: String): String = {
    val buf = new java.io.ByteArrayOutputStream(64)
    var b = in.read()
    while (b != '\n') {
      if (b == -1) throw new TornEofException(
        s"torn WARC record: $path: EOF inside header line at offset ${in.pos}")
      if (buf.size > MaxHeaderBytes) throw new IllegalStateException(
        s"malformed WARC record: $path: unterminated header line at offset ${in.pos}")
      buf.write(b)
      b = in.read()
    }
    val bytes = buf.toByteArray
    if (bytes.length == 0 || bytes(bytes.length - 1) != '\r')
      throw new IllegalStateException(
        s"malformed WARC record: $path: header line not CRLF-terminated at offset ${in.pos}")
    in.lastLineBytes = bytes.length + 1 // + the consumed LF
    new String(bytes, 0, bytes.length - 1, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Parse exactly ONE record at the stream's current position. Payload
    * bytes are materialized only when `wantPayload` AND the record passes
    * the pushed `types` filter — otherwise they are `skip`ped and
    * `matched = false` tells the caller the record was consumed only to
    * advance the stream (the caller owns the loop, because split-end
    * checks must run BETWEEN records).
    */
  def parseRecord(
      in: PosStream,
      path: String,
      wantPayload: Boolean,
      types: Option[Set[String]],
      wantHeaders: Boolean = false): Record = {
    val offset = in.pos
    val version = readLine(in, path)
    if (!version.startsWith("WARC/"))
      throw new IllegalStateException(
        s"malformed WARC record: $path: expected WARC/x.y version line at offset $offset, got '${version.take(32)}'")
    var recordId: String = null
    var recordType: String = null
    var targetUri: String = null
    var warcDate: String = null
    var contentType: String = null
    var contentLengthRaw: String = null
    // insertion-ordered so a headers-map round trip is deterministic
    val all: java.util.LinkedHashMap[String, String] =
      if (wantHeaders) new java.util.LinkedHashMap[String, String]() else null
    var headerBytes = 0
    var lastName: String = null
    var line = readLine(in, path)
    while (line.nonEmpty) {
      headerBytes += in.lastLineBytes
      if (headerBytes > MaxHeaderBytes) throw new IllegalStateException(
        s"malformed WARC record: $path: header block exceeds $MaxHeaderBytes bytes at offset $offset")
      val folded = line.charAt(0) == ' ' || line.charAt(0) == '\t'
      if (folded && lastName == null) throw new IllegalStateException(
        s"malformed WARC record: $path: continuation line with no preceding field at offset $offset")
      val (name, value) =
        if (folded) (lastName, line.trim) // ISO 28500 LWS field folding
        else {
          val i = line.indexOf(':')
          if (i <= 0) throw new IllegalStateException(
            s"malformed WARC record: $path: bad header line '${line.take(64)}' at offset $offset")
          (line.substring(0, i).toLowerCase(java.util.Locale.ROOT), line.substring(i + 1).trim)
        }
      lastName = name
      def fold(prev: String): String =
        if (folded && prev != null) prev + " " + value else value
      name match {
        case "warc-record-id" => recordId = fold(recordId)
        case "warc-type" => recordType = fold(recordType)
        case "warc-target-uri" => targetUri = fold(targetUri)
        case "warc-date" => warcDate = fold(warcDate)
        case "content-type" => contentType = fold(contentType)
        case "content-length" => contentLengthRaw = fold(contentLengthRaw)
        case _ => () // other WARC/extension headers: via the headers map
      }
      if (all != null) all.put(name, fold(all.get(name)))
      line = readLine(in, path)
    }
    if (contentLengthRaw == null) throw new IllegalStateException(
      s"malformed WARC record: $path: missing Content-Length at offset $offset")
    // parse AFTER folding: a folded continuation ('1000' + ' 20' -> '1000 20')
    // must fail toLong loudly, not silently replace the framing length
    val contentLength = try contentLengthRaw.toLong catch {
      case _: NumberFormatException => throw new IllegalStateException(
        s"malformed WARC record: $path: unparseable Content-Length '$contentLengthRaw' at offset $offset")
    }
    if (contentLength < 0) throw new IllegalStateException(
      s"malformed WARC record: $path: negative Content-Length $contentLength at offset $offset")
    val matches = types.forall(t => recordType != null && t.contains(recordType))
    var payload: Array[Byte] = null
    if (wantPayload && matches) {
      if (contentLength > Int.MaxValue - 8) throw new IllegalStateException(
        s"malformed WARC record: $path: payload of $contentLength bytes at offset $offset exceeds the row limit")
      payload = new Array[Byte](contentLength.toInt)
      in.readFully(payload, contentLength.toInt, path, "payload")
    } else {
      in.skipFully(contentLength, path, "payload")
    }
    var k = 0
    while (k < 4) {
      val b = in.read()
      val want = if (k % 2 == 0) '\r' else '\n'
      if (b != want) throw new IllegalStateException(
        s"torn WARC record: $path: record at offset $offset not terminated by CRLFCRLF " +
          s"(byte ${if (b < 0) "EOF" else b.toString} at offset ${in.pos})")
      k += 1
    }
    Record(offset, recordId, recordType, targetUri, warcDate, contentType,
      contentLength, payload, matches,
      if (all == null) null else {
        import scala.jdk.CollectionConverters._
        // LinkedHashMap preserves file order through the conversion
        scala.collection.immutable.ListMap(all.asScala.toSeq: _*)
      })
  }

  /** Find the first VALIDATED record boundary at offset ≥ `start`:
    * scan for the `\r\n\r\nWARC/` separator (beginning 4 bytes early so a
    * boundary exactly at `start` is caught), then accept the candidate
    * only if a full header block with a parseable Content-Length parses
    * there — payload bytes that merely embed the magic are rejected and
    * the scan continues. Returns None when no record starts before `end`.
    */
  def sync(
      raw: org.apache.hadoop.fs.FSDataInputStream,
      start: Long,
      end: Long,
      path: String): Option[Long] = {
    val pattern = "\r\n\r\nWARC/".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var scanFrom = math.max(0L, start - 4)
    val buf = new Array[Byte](1 << 16)
    var carry = new Array[Byte](0)
    var bufStart = scanFrom
    raw.seek(scanFrom)
    while (scanFrom < end + pattern.length) {
      val n = raw.read(buf, 0, buf.length)
      if (n <= 0) return None
      val window = carry ++ java.util.Arrays.copyOf(buf, n)
      val windowStart = bufStart - carry.length
      var i = 0
      while (i <= window.length - pattern.length) {
        var j = 0
        while (j < pattern.length && window(i + j) == pattern(j)) j += 1
        if (j == pattern.length) {
          val boundary = windowStart + i + 4
          if (boundary >= start && boundary < end && validatesAt(raw, boundary, path)) {
            return Some(boundary)
          } else if (boundary >= end) {
            return None
          }
          // invalid or pre-start candidate: keep scanning
          raw.seek(bufStart + n) // restore sequential position after validate
        }
        i += 1
      }
      carry = java.util.Arrays.copyOfRange(window,
        math.max(0, window.length - (pattern.length - 1)), window.length)
      bufStart += n
      scanFrom = bufStart
    }
    None
  }

  /** Candidate boundary check: a version line + full header block with a
    * parseable Content-Length must parse at the offset.
    */
  private def validatesAt(
      raw: org.apache.hadoop.fs.FSDataInputStream,
      boundary: Long,
      path: String): Boolean = {
    raw.seek(boundary)
    val probe = new PosStream(new BufferedInputStream(raw, 1 << 14), boundary)
    try {
      val v = readLine(probe, path)
      if (!v.startsWith("WARC/")) return false
      var line = readLine(probe, path)
      var sawLength = false
      var sawField = false
      var headerBytes = 0
      while (line.nonEmpty) {
        headerBytes += probe.lastLineBytes
        if (headerBytes > MaxHeaderBytes) return false
        val folded = line.charAt(0) == ' ' || line.charAt(0) == '\t'
        // mirror parseRecord exactly: a folded line with no preceding
        // field is NOT a valid block — returning true here would send
        // parseRecord to crash on a decoy the scan should keep skipping
        if (folded && !sawField) return false
        if (!folded) {
          sawField = true
          val i = line.indexOf(':')
          if (i <= 0) return false
          if (line.substring(0, i).equalsIgnoreCase("content-length")) {
            sawLength = line.substring(i + 1).trim.forall(_.isDigit) &&
              line.substring(i + 1).trim.nonEmpty
          }
        }
        line = readLine(probe, path)
      }
      sawLength
    } catch {
      // EOF with header bytes still owed = a genuinely TORN tail, not
      // payload noise: fail the split loudly instead of silently skipping
      // the record (a decoy candidate fails with a malformed line while
      // file bytes remain — that one keeps scanning)
      case torn: TornEofException =>
        throw new IllegalStateException(
          s"torn WARC record at split boundary $boundary in $path: ${torn.getMessage}")
      case _: IllegalStateException | _: EOFException => false
    }
  }

  private[sources] def utf8OrNull(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)
}

// ----------------------------------------------------------------- write path

/** `df.write.format("warc").save(dir)` — export a curated corpus back to
  * the archival interchange format: one `part-<pid>.warc` file per input
  * partition (`.option("gzip", true)` writes `part-<pid>.warc.gz` with one
  * gzip MEMBER per record — the CommonCrawl layout, so a later read
  * parallelizes on files and any member-aware tool can split). `payload`
  * is required binary; header columns are optional strings with WET-style
  * defaults (record_type `conversion`, content_type `text/plain`, a
  * deterministic per-partition record id, epoch date). Attempts write an
  * attempt-unique temp name and RENAME into place at commit, so
  * speculative/zombie attempts can neither interleave bytes nor delete a
  * committed file; empty partitions write nothing. Target must be empty unless
  * `mode("overwrite")` — an append could interleave with a concurrent
  * reader's directory listing. There is no manifest: WARC framing is the
  * integrity check (the reader verifies Content-Length + CRLF framing
  * per record and fails loudly on a torn file).
  */
private[sources] class WarcWriteBuilder(
    path: String,
    schema: StructType,
    options: CaseInsensitiveStringMap,
    truncate: Boolean)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {

  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder =
    new WarcWriteBuilder(path, schema, options, truncate = true)

  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def description(): String = s"warc:$path"
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = {
        val spark = org.apache.spark.sql.SparkSession.active
        new WarcBatchWrite(path, schema,
          options.getBoolean("gzip", false), truncate,
          new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
      }
    }
}

private[sources] case class WarcWriteCommit(name: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class WarcBatchWrite(
    path: String,
    schema: StructType,
    gzip: Boolean,
    truncate: Boolean,
    conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.BatchWrite {

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    val hconf = conf.value
    graft.io.HadoopIO.mkdirs(path, hconf)
    val existing = WarcScan.Extensions
      .flatMap(ext => graft.io.HadoopIO.glob(path, s"*$ext", hconf)).distinct
    if (truncate) existing.foreach(graft.io.HadoopIO.delete(_, hconf))
    else require(existing.isEmpty,
      s"$path already holds WARC files — use mode(\"overwrite\") to replace them " +
        "(an append could interleave with a concurrent reader's listing)")
    new WarcWriterFactory(schema, path, gzip, conf)
  }

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = ()

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    messages.foreach {
      case WarcWriteCommit(name) if name != null =>
        try graft.io.HadoopIO.delete(s"$path/$name", conf.value)
        catch { case _: Exception => () }
      case _ => ()
    }
}

private[sources] class WarcWriterFactory(
    schema: StructType,
    path: String,
    gzip: Boolean,
    conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new WarcDataWriter(partitionId, taskId, schema, path, gzip, conf)
}

private[sources] class WarcDataWriter(
    partitionId: Int,
    taskId: Long,
    schema: StructType,
    path: String,
    gzip: Boolean,
    conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private def idx(n: String): Int =
    if (schema.fieldNames.contains(n)) schema.fieldIndex(n) else -1
  private val payloadIdx = schema.fieldIndex("payload")
  private val typeIdx = idx("record_type")
  private val ridIdx = idx("record_id")
  private val uriIdx = idx("target_uri")
  private val dateIdx = idx("warc_date")
  private val ctypeIdx = idx("content_type")

  private val name = s"part-$partitionId.warc" + (if (gzip) ".gz" else "")
  // tasks write an ATTEMPT-unique temp name and rename into place at
  // commit: under speculation/zombie retries two attempts of a partition
  // run concurrently, and writing the final name directly would let them
  // interleave bytes — or let the loser's abort() delete the winner's
  // committed file. Spark's commit coordinator admits exactly one
  // commit(); its rename is the publish point. The .tmp suffix keeps
  // half-written attempts invisible to readers (extension-filtered).
  private val tmpName = s".$name.attempt-$taskId.tmp"
  private val hPath = new org.apache.hadoop.fs.Path(s"$path/$tmpName")
  private var out: java.io.OutputStream = _
  private var ordinal = 0L

  private def str(row: InternalRow, i: Int, default: => String): String =
    if (i < 0 || row.isNullAt(i)) default else row.getUTF8String(i).toString

  override def write(row: InternalRow): Unit = {
    if (out == null)
      out = new java.io.BufferedOutputStream(
        hPath.getFileSystem(conf.value).create(hPath, true), 1 << 16)
    require(!row.isNullAt(payloadIdx),
      s"warc write: null payload at partition $partitionId ordinal $ordinal — " +
        "filter nulls or write an empty binary")
    val rec = WarcFormat.buildRecord(
      str(row, typeIdx, "conversion"),
      str(row, ridIdx, s"<urn:graft:$partitionId:$ordinal>"),
      str(row, uriIdx, null),
      str(row, dateIdx, "1970-01-01T00:00:00Z"),
      str(row, ctypeIdx, "text/plain"),
      row.getBinary(payloadIdx))
    out.write(if (gzip) WarcFormat.gzipMember(rec) else rec)
    ordinal += 1
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    if (out == null) return WarcWriteCommit(null) // empty partition: no file
    out.close()
    graft.io.HadoopIO.delete(s"$path/$name", conf.value) // stale prior attempt
    graft.io.HadoopIO.rename(s"$path/$tmpName", s"$path/$name", conf.value)
    WarcWriteCommit(name)
  }

  override def abort(): Unit = {
    if (out != null) { try out.close() catch { case _: Exception => () } }
    // only THIS attempt's temp file — never the final name another
    // attempt may have committed
    try graft.io.HadoopIO.delete(s"$path/$tmpName", conf.value)
    catch { case _: Exception => () }
  }

  override def close(): Unit = ()
}
