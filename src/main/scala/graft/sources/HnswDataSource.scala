package graft.sources

import graft.hnsw.HnswIndex
import graft.io.{HadoopIO, SerializableHadoopConf}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
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

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("hnsw source requires a path: spark.read.format(\"hnsw\").load(dir)"))
    new HnswTable(path)
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

private[sources] class HnswTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"hnsw:$path"
  override def schema(): StructType = HnswDataSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HnswScanBuilder(path)
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
