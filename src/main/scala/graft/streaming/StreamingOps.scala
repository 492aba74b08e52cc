package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured Streaming counterparts of the reference's online mutation and
  * query paths (`/root/reference/storage/dataset.go:238-348`): the batch
  * engine handles index builds; streams handle continuous ingestion.
  *
  *  - [[windowedEventStats]]: tumbling-window aggregation with a watermark —
  *    the streaming analog of the `events_window` batch query.
  *  - [[latestVectorState]]: per-key latest-version upsert state via
  *    `mapGroupsWithState` — the reference's BatchInsert/Update semantics
  *    applied continuously (latest write wins per id, tombstone on remove).
  */
object StreamingOps {

  /** Tumbling-window counts/sums per event type. `events` must have
    * (ts: timestamp, event_type: string, value: double).
    */
  def windowedEventStats(
      events: DataFrame,
      windowDuration: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Sliding-window stats: overlapping windows of `windowDuration` sliding
    * every `slideDuration` — each event lands in
    * windowDuration/slideDuration windows.
    */
  def slidingEventStats(
      events: DataFrame,
      windowDuration: String = "10 minutes",
      slideDuration: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration, slideDuration), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Watermarked stream-stream inner join: enrich an event stream with a
    * (streamed) user-attribute stream within a bounded time skew — state on
    * both sides is dropped past the watermark, so memory stays bounded.
    */
  def enrichedEvents(
      events: DataFrame, // (ts, user_id, event_type, value)
      users: DataFrame,  // (u_ts, user_id, segment)
      maxSkew: String = "10 minutes"): DataFrame = {
    val e = events.withWatermark("ts", maxSkew)
    val u = users.withWatermark("u_ts", maxSkew).withColumnRenamed("user_id", "u_user_id")
    e.join(u,
      col("user_id") === col("u_user_id") &&
        col("u_ts") >= col("ts") - expr(s"INTERVAL $maxSkew") &&
        col("u_ts") <= col("ts"))
      .drop("u_user_id")
  }

  /** One vector-mutation event: op ∈ {upsert, remove}. */
  case class VectorOp(id: Long, op: String, vector: Array[Float], version: Long)

  /** Current state of one id after applying ops. */
  case class VectorState(id: Long, vector: Array[Float], version: Long, deleted: Boolean)

  private def applyOps(
      id: Long,
      ops: Iterator[VectorOp],
      state: GroupState[VectorState]): VectorState = {
    var current = state.getOption.getOrElse(VectorState(id, Array.empty, -1L, deleted = true))
    ops.toSeq.sortBy(_.version).foreach { op =>
      if (op.version > current.version) {
        current =
          if (op.op == "remove") VectorState(id, Array.empty, op.version, deleted = true)
          else VectorState(id, op.vector, op.version, deleted = false)
      }
    }
    state.update(current)
    current
  }

  /** Continuously folds a stream of mutations into latest-wins per-id state
    * (higher version wins; `remove` writes a tombstone). Emits the state of
    * every id touched in the micro-batch — feed it to any sink to maintain a
    * queryable current snapshot.
    */
  def latestVectorState(spark: SparkSession, ops: Dataset[VectorOp]): Dataset[VectorState] = {
    import spark.implicits._
    ops
      .groupByKey(_.id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(applyOps)
  }

  /** Cross-batch version store for maintenance sinks: folds the op stream
    * through [[latestVectorState]] and re-emits every touched id's CURRENT
    * state as an effective op. A stale version arriving in a LATER
    * micro-batch re-emits the stored newer state instead of the stale
    * vector, so downstream index maintenance ([[hnswMaintenanceSink]])
    * is idempotent against out-of-order delivery across batches — the
    * sink's own latest-wins window only covers reordering INSIDE one
    * batch. Compose as
    * `versionedOps(spark, ops).writeStream.outputMode("update")
    *   .foreachBatch(hnswMaintenanceSink(...))`.
    */
  def versionedOps(spark: SparkSession, ops: Dataset[VectorOp]): Dataset[VectorOp] = {
    import spark.implicits._
    latestVectorState(spark, ops).map { s =>
      VectorOp(s.id, if (s.deleted) "remove" else "upsert", s.vector, s.version)
    }
  }

  /** Streaming exact dedup: keep the first occurrence per content digest,
    * with state bounded by the watermark (brief: dedup as a first-class
    * pipeline op, here in its continuous-ingestion form).
    * `docs` must have (ts: timestamp, doc_id: long, text: string).
    */
  def dedupStream(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("digest")

  /** `foreachBatch` sink that maintains persisted per-partition HNSW
    * graphs from a stream of [[VectorOp]] mutations: upserts are appended
    * (existing ids are removed first — HNSW insert is add-only), removes
    * tombstone. The continuous version of the reference's online
    * BatchInsert/BatchRemove into partition indexes.
    */
  def hnswMaintenanceSink(
      indexDir: String,
      numPartitions: Int,
      config: graft.hnsw.HnswConfig = graft.hnsw.HnswConfig()): (Dataset[VectorOp], Long) => Unit = { (batch, _) =>
    val spark = batch.sparkSession
    // fully distributed routing — the batch never lands on the driver, so a
    // burst micro-batch is bounded by executor memory, not driver memory
    val ops = batch.toDF().persist()
    try {
      // every touched id is removed first: HNSW insert is add-only, so a
      // re-upsert must tombstone the old vertex before the new one lands
      graft.hnsw.HnswSpark.removeAndSave(
        spark, ops.select("id").distinct(), indexDir, numPartitions)
      // latest version per id wins WITHIN the micro-batch. Cross-batch
      // ordering is the source's responsibility (the reference's
      // BatchInsert likewise applies batches in arrival order without a
      // version store); pair with [[latestVectorState]] upstream when the
      // stream can deliver stale versions across batches.
      // secondary keys make equal-version ties deterministic across runs
      // (op, then a stable hash of the payload)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id")
        .orderBy(col("version").desc, col("op"), xxhash64(col("vector")))
      val upserts = ops
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1 && col("op") === "upsert")
        .select("id", "vector")
      graft.hnsw.HnswSpark.appendAndSave(spark, upserts, indexDir, numPartitions,
        config = config)
    } finally ops.unpersist()
  }

  /** Output mode required by [[latestVectorState]] sinks. */
  val UpsertOutputMode: OutputMode = OutputMode.Update()
}
