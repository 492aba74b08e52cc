package graft.ops

import graft.hnsw.{HnswConfig, HnswSpark}
import graft.knn.Knn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing facade with the reference Dataset's API surface
  * (`/root/reference/storage/dataset.go`): batch insert/update/remove with
  * hash partition routing (`dataset.go:238-348,537`), dimension validation
  * (`dataset.go:526` DimensionMissmatchErr), exact and approximate search
  * with per-partition fan-out + global k-merge (`dataset.go:349-433`).
  *
  * Immutable-functional: every mutation returns a new [[VectorDataset]]
  * over the derived DataFrame (Spark-first replacement for the reference's
  * in-place concurrent mutations; versioning is positional — later batches
  * win).
  *
  * Schema: (id: long, vector: array<float>, meta: string nullable).
  */
final class VectorDataset private (
    val spark: SparkSession,
    val data: DataFrame,
    val dimension: Int,
    val metric: String,
    val numPartitions: Int) extends Serializable {

  import VectorDataset._

  /** Row count (reference `Dataset.Len`, dataset.go:160). */
  def count(): Long = data.count()

  private def checkDim(items: DataFrame): DataFrame = {
    val bad = items.filter(size(col("vector")) =!= dimension).limit(1).count()
    if (bad > 0) throw new IllegalArgumentException(s"dimension mismatch: expected $dimension")
    items
  }

  private def routed(df: DataFrame): DataFrame =
    df.repartition(numPartitions, col("id"))

  /** Insert new items; existing ids are an error, as in
    * `storage/partition.go` batchInsert → ItemAlreadyExistsError.
    */
  def batchInsert(items: DataFrame): VectorDataset = {
    val it = normalize(items)
    // ONE validation action: the dimension check (items side) unions with
    // the duplicate-id probe (single broadcast-join scan of the base) —
    // one job over the base instead of two at scale
    val errs = it.filter(size(col("vector")) =!= dimension).select(lit("dim").as("err"))
      .unionByName(
        data.select("id").join(broadcast(it.select("id")), Seq("id")).select(lit("dup").as("err")))
      .groupBy("err").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (errs.getOrElse("dim", 0L) > 0)
      throw new IllegalArgumentException(s"dimension mismatch: expected $dimension")
    if (errs.getOrElse("dup", 0L) > 0)
      throw new IllegalArgumentException("item already exists")
    copyWith(routed(data.unionByName(it)))
  }

  /** Upsert (reference BatchUpdate semantics: replace existing values). */
  def batchUpdate(items: DataFrame): VectorDataset = {
    val it = normalize(checkDim(items))
    val merged = Mutations.upsert(
      data.withColumn("__v", lit(1)),
      it.withColumn("__v", lit(2)),
      key = "id", version = "__v").drop("__v")
    copyWith(routed(merged))
  }

  /** Remove by id (reference BatchRemove). */
  def batchRemove(ids: DataFrame): VectorDataset =
    copyWith(Mutations.remove(data, ids, "id"))

  /** Exact top-k search: per-partition candidates + global merge. */
  def search(queries: Array[(Long, Array[Float])], k: Int): DataFrame = {
    queries.foreach { case (_, v) =>
      if (v.length != dimension)
        throw new IllegalArgumentException(s"dimension mismatch: expected $dimension")
    }
    Knn.partitioned(spark, data.select("id", "vector"), queries, k, metric)
  }

  /** Exact top-k search with a DataFrame query side — the corpus-vs-corpus
    * shape; the query batch never lands on the driver. (qid, qvec) rows,
    * dimension checked distributed.
    */
  def searchDF(queries: DataFrame, k: Int): DataFrame = {
    val checked = queries.select(col("qid").cast("long"),
      col("qvec").cast("array<float>"))
    Knn.partitionedDF(data.select("id", "vector"),
      checked.withColumn("qvec",
        when(size(col("qvec")) === dimension, col("qvec"))
          .otherwise(raise_error(concat(lit(s"dimension mismatch: expected $dimension, got "),
            size(col("qvec")).cast("string"))))),
      k, metric)
  }

  /** Approximate top-k via per-partition HNSW graphs. */
  def searchApprox(
      queries: Array[(Long, Array[Float])],
      k: Int,
      config: HnswConfig = HnswConfig()): DataFrame =
    HnswSpark.search(spark, data.select("id", "vector"), queries, k, metric, config, numPartitions)

  /** Approximate search over SQ8-quantized storage: coarse pass on 1-byte
    * codes, exact rescore of candidates (see [[graft.knn.Quantize]]).
    */
  def searchQuantized(queries: Array[(Long, Array[Float])], k: Int, overscan: Int = 4): DataFrame =
    graft.knn.Quantize.search(spark,
      graft.knn.Quantize.sq8(data.select("id", "vector")), queries, k, overscan, metric)

  /** Persist per-partition HNSW index artifacts (hnsw_persistence.go). A
    * `metadata` column, when present, rides into the graph vertices and the
    * v2 persistence format.
    */
  def buildIndex(outDir: String, config: HnswConfig = HnswConfig()): Array[(Int, Int)] = {
    val cols = if (data.columns.contains("metadata")) Seq("id", "vector", "metadata")
               else Seq("id", "vector")
    HnswSpark.buildAndSave(spark, data.select(cols.head, cols.tail: _*), outDir, metric, config, numPartitions)
  }

  def save(path: String): Unit =
    data.write.mode("overwrite").parquet(path)

  private def copyWith(df: DataFrame): VectorDataset =
    new VectorDataset(spark, df, dimension, metric, numPartitions)
}

object VectorDataset {

  private def normalize(df: DataFrame): DataFrame = {
    val withMeta = if (df.columns.contains("meta")) df else df.withColumn("meta", lit(null).cast("string"))
    withMeta.select(col("id").cast("long"), col("vector").cast("array<float>"), col("meta"))
  }

  /** Create over an existing (id, vector[, meta]) DataFrame. */
  def apply(
      spark: SparkSession,
      df: DataFrame,
      dimension: Int,
      metric: String = "euclidean",
      numPartitions: Int = 0): VectorDataset = {
    val p = if (numPartitions > 0) numPartitions
    else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    new VectorDataset(spark, normalize(df), dimension, metric, p)
  }

  def load(spark: SparkSession, path: String, dimension: Int, metric: String = "euclidean"): VectorDataset =
    apply(spark, spark.read.parquet(path), dimension, metric)
}
