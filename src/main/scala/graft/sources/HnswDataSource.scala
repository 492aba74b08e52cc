package graft.sources

import graft.hnsw.{HnswConfig, HnswIndex}
import graft.io.{HadoopIO, Manifest, ManifestEntry, SerializableHadoopConf}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector over persisted HNSW partition graphs: the
  * binary artifacts [[graft.hnsw.HnswSpark.buildAndSave]] writes become a
  * readable Spark table —
  *
  *   spark.read.format("hnsw").load(indexDir)
  *   // (part int, id long, level int, vector array<float>, metadata binary)
  *
  * The relational escape hatch for index artifacts (reference persistence:
  * `index/hnsw_persistence.go` — whose format this reads): audit an index
  * without search (row counts, dim checks, id reconciliation against the
  * source-of-truth table), re-embed, or migrate — all through the planner,
  * with the usual Spark parallelism.
  *
  * Scale/plan shape: one InputPartition per `part-*.hnsw` artifact (the
  * build's partition count is the read's parallelism — same contract as
  * parquet's file splits, except graph files are atomic units). Column
  * pruning pushes down: a `select(id)` never materializes vectors into
  * rows. The per-file manifest (length + CRC) is validated before any
  * task runs, so a torn artifact set fails at planning, not mid-scan.
  */
class HnswDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "hnsw"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HnswDataSource.schema

  // the WRITE schema is the incoming frame's (id, vector[, metadata]) —
  // narrower than the read schema (part/level are build products), so the
  // provider accepts external metadata and validates it in newWriteBuilder
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("hnsw source requires a path: spark.read.format(\"hnsw\").load(dir)"))
    // reads resolve with the inferred artifact schema; writes hand the
    // incoming frame's (narrower) schema through here — the table must
    // echo it back or Spark demands build-product columns (part/level)
    // from the writer
    new HnswTable(path, schema)
  }
}

object HnswDataSource {
  val schema: StructType = StructType(Seq(
    StructField("part", IntegerType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("level", IntegerType, nullable = false),
    StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("metadata", BinaryType, nullable = true)))
}

private[sources] class HnswTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"hnsw:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HnswScanBuilder(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    val extra = s.fieldNames.filterNot(Set("id", "vector", "metadata"))
    require(extra.isEmpty,
      s"hnsw write takes (id long, vector array<float>[, metadata binary]) — " +
        s"unexpected column(s) ${extra.mkString(", ")}; project them away (level/part are build products)")
    def fieldType(n: String): Option[DataType] = s.find(_.name == n).map(_.dataType)
    require(fieldType("id").contains(LongType),
      s"hnsw write needs id: bigint, got ${fieldType("id").map(_.catalogString).getOrElse("<missing>")}")
    require(fieldType("vector").exists {
      case ArrayType(FloatType, _) => true
      case _ => false
    }, s"hnsw write needs vector: array<float>, got ${fieldType("vector").map(_.catalogString).getOrElse("<missing>")} (cast first)")
    require(fieldType("metadata").forall(_ == BinaryType),
      s"hnsw write needs metadata: binary, got ${fieldType("metadata").map(_.catalogString).get}")
    new HnswWriteBuilder(path, s, info.options(), truncate = false)
  }
}

/** `df.write.format("hnsw").save(dir)` — distributed HNSW index BUILD as
  * a declarative Spark write. [[RequiresDistributionAndOrdering]] asks the
  * PLANNER for the id-clustered, id-sorted layout the deterministic build
  * needs (the same hash-partition + in-partition sort
  * [[graft.hnsw.HnswSpark.buildAndSave]] does by hand), so the write
  * composes with AQE and whatever upstream shape the frame already has.
  * Each task builds one partition graph and writes `part-<pid>.hnsw`; the
  * driver commit writes the completeness manifest LAST from the tasks'
  * (name, len, crc) commit messages — a torn job never publishes a
  * readable manifest (same fail-loud contract as the programmatic path,
  * enforced at read planning).
  *
  * Options: `metric` (euclidean|manhattan|cosine), `m`, `ef_construction`,
  * `heuristic`, `partitions` (exact output partition count; 0 = planner's
  * choice). Modes: `overwrite` truncates the directory; `append` is only
  * valid into an empty/new directory — incremental maintenance is the
  * delta-log streaming path, not a blind second build.
  */
private[sources] class HnswWriteBuilder(
    path: String,
    schema: StructType,
    options: CaseInsensitiveStringMap,
    truncate: Boolean) extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder =
    new HnswWriteBuilder(path, schema, options, truncate = true)

  override def build(): Write = {
    val metric = options.getOrDefault("metric", "euclidean")
    val config = HnswConfig(
      m = options.getInt("m", HnswConfig().m),
      ef = options.getInt("ef", HnswConfig().ef),
      efConstruction = options.getInt("ef_construction", HnswConfig().efConstruction),
      heuristic = options.getBoolean("heuristic", HnswConfig().heuristic))
    new HnswWrite(path, schema, graft.core.Distances.metricId(metric), config,
      options.getInt("partitions", 0), truncate)
  }
}

private[sources] class HnswWrite(
    path: String,
    schema: StructType,
    metric: Int,
    config: HnswConfig,
    partitions: Int,
    truncate: Boolean) extends Write with RequiresDistributionAndOrdering {

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity("id")))
  override def requiredOrdering(): Array[SortOrder] =
    Array(Expressions.sort(Expressions.column("id"), SortDirection.ASCENDING))
  override def requiredNumPartitions(): Int = partitions
  override def description(): String = s"hnsw:$path"

  override def toBatch: BatchWrite = {
    val spark = org.apache.spark.sql.SparkSession.active
    new HnswBatchWrite(path, schema, metric, config, truncate,
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
  }
}

private[sources] case class HnswCommit(name: String, len: Long, crc: Long)
    extends WriterCommitMessage

private[sources] class HnswBatchWrite(
    path: String,
    schema: StructType,
    metric: Int,
    config: HnswConfig,
    truncate: Boolean,
    conf: SerializableHadoopConf) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val hconf = conf.value
    HadoopIO.mkdirs(path, hconf)
    val existing = HadoopIO.globWithLength(path, "*.hnsw", hconf)
    if (truncate) {
      existing.foreach { case (uri, _) => HadoopIO.delete(uri, hconf) }
      HadoopIO.delete(s"$path/${Manifest.FileName}", hconf)
    } else {
      require(existing.isEmpty && Manifest.read(path, hconf).isEmpty,
        s"$path already holds an hnsw index — use mode(\"overwrite\") to rebuild, or the " +
          "streaming maintenance API for incremental updates (append would tear the graph set)")
    }
    new HnswWriterFactory(schema, metric, config, path, conf)
  }

  // tasks write their final part-<pid> names directly (partition id, not
  // attempt, names the artifact — a retry overwrites its predecessor);
  // the manifest is the publish point and is written last, here
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val entries = messages.collect { case HnswCommit(name, len, crc) if name != null =>
      ManifestEntry(name, len, crc)
    }
    Manifest.write(path, entries.toSeq, conf.value)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case HnswCommit(name, _, _) if name != null =>
        try HadoopIO.delete(s"$path/$name", conf.value) catch { case _: Exception => () }
      case _ => ()
    }
}

private[sources] class HnswWriterFactory(
    schema: StructType,
    metric: Int,
    config: HnswConfig,
    path: String,
    conf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new HnswDataWriter(partitionId, schema, metric, config, path, conf)
}

private[sources] class HnswDataWriter(
    partitionId: Int,
    schema: StructType,
    metric: Int,
    config: HnswConfig,
    path: String,
    conf: SerializableHadoopConf) extends DataWriter[InternalRow] {

  private val idIdx = schema.fieldIndex("id")
  private val vecIdx = schema.fieldIndex("vector")
  private val metaIdx = if (schema.fieldNames.contains("metadata")) schema.fieldIndex("metadata") else -1
  private val index = new HnswIndex(metric, config)

  override def write(row: InternalRow): Unit = {
    val meta = if (metaIdx >= 0 && !row.isNullAt(metaIdx)) row.getBinary(metaIdx) else null
    index.add(row.getLong(idIdx), row.getArray(vecIdx).toFloatArray(), meta)
  }

  override def commit(): WriterCommitMessage =
    if (index.size == 0) HnswCommit(null, 0L, 0L) // empty partition: no artifact
    else {
      val name = s"part-$partitionId.hnsw"
      val (_, len, crc) = HadoopIO.writeChecked(s"$path/$name", conf.value)(index.save)
      HnswCommit(name, len, crc)
    }

  override def abort(): Unit = () // nothing durable until commit()
  override def close(): Unit = ()
}

private[sources] class HnswScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = HnswDataSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the source's field order so ordinal row-building stays
    // aligned with what Spark expects back
    required = StructType(HnswDataSource.schema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new HnswScan(path, required)
}

private[sources] class HnswScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val hconf = spark.sparkContext.hadoopConfiguration
    // manifest-guarded listing: a missing/torn artifact fails HERE (at
    // planning) instead of surfacing as a silently partial table
    val files = graft.io.Manifest.validate(path,
      HadoopIO.globWithLength(path, "*.hnsw", hconf), hconf)
    files.map { case (uri, _) =>
      val part = "part-(\\d+)\\.hnsw$".r.findFirstMatchIn(uri).map(_.group(1).toInt).getOrElse(-1)
      HnswInputPartition(uri, part): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    new HnswReaderFactory(required.fieldNames,
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
  }
}

private[sources] case class HnswInputPartition(uri: String, part: Int) extends InputPartition

private[sources] class HnswReaderFactory(fields: Array[String], conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HnswInputPartition]
    new HnswPartitionReader(p, fields, conf)
  }
}

private[sources] class HnswPartitionReader(
    partition: HnswInputPartition,
    fields: Array[String],
    conf: SerializableHadoopConf) extends PartitionReader[InternalRow] {

  // graph artifacts are atomic units: load once, iterate vertices. Memory
  // is one partition graph — the same bound every search task already has.
  private val rows: Iterator[(Long, Array[Float], Int, Array[Byte])] =
    HadoopIO.read(partition.uri, conf.value)(HnswIndex.load).vertexRows
  private var current: (Long, Array[Float], Int, Array[Byte]) = _

  override def next(): Boolean = {
    if (!rows.hasNext) return false
    current = rows.next()
    true
  }

  override def get(): InternalRow = {
    val out = new GenericInternalRow(fields.length)
    var i = 0
    while (i < fields.length) {
      fields(i) match {
        case "part" => out.setInt(i, partition.part)
        case "id" => out.setLong(i, current._1)
        case "level" => out.setInt(i, current._3)
        case "vector" => out.update(i, UnsafeArrayData.fromPrimitiveArray(current._2))
        case "metadata" => out.update(i, current._4)
      }
      i += 1
    }
    out
  }

  override def close(): Unit = ()
}
