package graft.knn

import graft.core.Distances
import graft.functions.vec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch k-nearest-neighbor search: the Spark-native analog of the
  * reference's partitioned dataset search
  * (`/root/reference/storage/dataset.go:349-433`): each partition computes a
  * local top-k per query, the tiny candidate union (≤ k·P·Q rows) is merged
  * into a global top-k. No global sort of the data, no N×Q shuffle.
  */
object Knn {

  /** Guard for a caller-supplied materialized prefix/projection column:
    * the distance kernels truncate to the shorter array, so an element
    * length different from the declared coarse dimension would silently
    * compute coarse distances over the wrong number of dimensions.
    * `assert_true` keeps the column's type and fails loudly on the first
    * mismatched row instead (the when-isNull wrapper is the standard
    * pass-through idiom — assert_true returns null on success).
    */
  private[knn] def checkedCoarseCol(name: String, dim: Int, what: String): org.apache.spark.sql.Column =
    when(assert_true(size(col(name)) === dim,
      lit(s"$what column '$name' must have exactly $dim elements")).isNull,
      col(name))

  /** Exact brute-force kNN as a declarative plan: broadcast the (small) query
    * side, let Catalyst pick BroadcastNestedLoopJoin, rank per query with a
    * deterministic (dist, id) tie-break. This is the SQL-expressible oracle
    * formulation (reference oracle: `index/hnsw_test.go:21-75`).
    *
    * data: (id: long, vector: array<float>), queries: (qid: long, qvec: array<float>)
    */
  def bruteForce(data: DataFrame, queries: DataFrame, k: Int, metric: String = "euclidean"): DataFrame = {
    val d = data.crossJoin(broadcast(queries))
      .select(col("qid"), col("id"), vec.dist(col("vector"), col("qvec"), metric).as("dist"))
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("id"))
    d.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact RADIUS search: every data vector within distance `r` of each
    * query — the range-query twin of top-k (dedup-by-radius, geofencing,
    * "everything closer than the duplicate threshold"). Same plan shape
    * as [[bruteForce]]: queries broadcast, the scan streams once, and the
    * radius predicate is a codegen'd filter ON the scan — no window, no
    * shuffle beyond the final ordering, and the filter's selectivity
    * (not k) bounds the output. At 100 TB the same query runs against an
    * IVF assignment by pre-filtering to cells whose centroid is within
    * r + cell radius; this is the exact reference arm.
    */
  def radius(data: DataFrame, queries: DataFrame, r: Double,
      metric: String = "euclidean"): DataFrame =
    data.crossJoin(broadcast(queries))
      .select(col("qid"), col("id"), vec.dist(col("vector"), col("qvec"), metric).as("dist"))
      .filter(col("dist") <= r)

  /** HARD-NEGATIVE mining for contrastive embedding training: per anchor,
    * the k nearest vectors whose distance EXCEEDS `minDist` — close
    * enough to be informative negatives, far enough to exclude the
    * anchor itself and its near-duplicates (which are probable unlabeled
    * positives; mining them as negatives poisons the loss). The band
    * filter runs ON the distance scan before the top-k window, so the
    * ranking never sees excluded candidates — this is [[bruteForce]]
    * restricted to the annulus (minDist, ∞), with the same
    * per-partition `WindowGroupLimit` bounding what reaches the qid
    * exchange. At 100 TB the identical band composes with the ANN tiers
    * (e.g. [[Ivf.searchSavedFiltered]], or SQ8/PQ coarse scans with the
    * filter on the rescore) — this exact formulation is their oracle.
    */
  def hardNegatives(data: DataFrame, queries: DataFrame, k: Int, minDist: Double,
      metric: String = "cosine"): DataFrame = {
    val d = data.crossJoin(broadcast(queries))
      .select(col("qid"), col("id"), vec.dist(col("vector"), col("qvec"), metric).as("dist"))
      .filter(col("dist") > minDist)
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("id"))
    d.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Matryoshka (prefix-dimension) retrieval, Kusupati et al. 2022: a
    * coarse top-`coarseK` pass over only the FIRST `dPrefix` dimensions,
    * then an exact full-dimension rescore of the candidates. MRL-trained
    * embeddings front-load information into the prefix, so a d/4 prefix
    * keeps most of the ranking signal at a quarter of the flops — and,
    * unlike PCA/OPQ/PQ, needs NO training pass over the corpus (the
    * "projection" is coordinate truncation fixed at embedding-training
    * time).
    *
    * Scale shape: at 100 TB the prefix is MATERIALIZED as its own parquet
    * column offline (pass its name as `prefixCol`) and the coarse scan
    * column-prunes to it — reading dPrefix/d of the vector bytes; the
    * inline `slice` default is the self-contained form for data without
    * the sidecar column. Candidates (coarseK·Q rows) broadcast back onto
    * the full-vector scan for the rescore, so the corpus never shuffles
    * in either stage. Both stages rank with a total (dist, id) tie-break:
    * given the inputs the result is fully deterministic — a SQL oracle
    * replays it — and `coarseK` ≥ the corpus size IS exact search.
    */
  def matryoshka(data: DataFrame, queries: DataFrame, k: Int, dPrefix: Int,
      coarseK: Int, metric: String = "euclidean",
      prefixCol: Option[String] = None): DataFrame = {
    require(coarseK >= k, s"coarseK ($coarseK) must be >= k ($k)")
    val dPre = prefixCol.map(checkedCoarseCol(_, dPrefix, "prefix"))
      .getOrElse(slice(col("vector"), 1, dPrefix))
    val qPre = slice(col("qvec"), 1, dPrefix)
    val coarse = data.select(col("id"), dPre.as("vp"))
      .crossJoin(broadcast(queries.select(col("qid"), qPre.as("qp"))))
      .select(col("qid"), col("id"), vec.dist(col("vp"), col("qp"), metric).as("cdist"))
    val w1 = Window.partitionBy("qid").orderBy(col("cdist"), col("id"))
    val cand = coarse.withColumn("r", row_number().over(w1)).filter(col("r") <= coarseK)
      .select("qid", "id")
    val rescored = data.join(broadcast(cand), Seq("id"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("id"), vec.dist(col("vector"), col("qvec"), metric).as("dist"))
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("id"))
    rescored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** [[matryoshka]] composed with IVF cell pruning — the 100 TB serving
    * form: probe `nprobe`/C of the cells AND read only `dPrefix`/d of the
    * vector bytes inside them (both pruning levers at once, the way the
    * SQ8/PQ/binary tiers already compose with IVF), then an exact
    * full-dimension rescore of the coarse survivors.
    *
    * Same plan shape as [[Ivf.search]]: probe pairs computed on the
    * driver (Q·nprobe rows, broadcast), the assigned corpus never
    * shuffles in either stage (probes and candidates broadcast onto it),
    * the coarse window is WindowGroupLimit-bounded, and a materialized
    * `prefixCol` lets the coarse scan column-prune to dPrefix/d of the
    * bytes. `nprobe >= C` with `coarseK >=` the corpus size degenerates
    * to exact brute force — the self-verifiable exactness arm. `dedup`
    * mirrors [[Ivf.search]]: set it for spilled assignments so a
    * multi-cell id cannot consume several coarse or final rank slots.
    */
  def matryoshkaIvf(
      spark: SparkSession,
      assigned: DataFrame, // output of Ivf.assign(): (id, cell, vector)
      centroids: Array[Array[Float]],
      queries: Array[(Long, Array[Float])],
      k: Int, nprobe: Int, dPrefix: Int, coarseK: Int,
      metric: String = "euclidean",
      prefixCol: Option[String] = None,
      dedup: Boolean = false): DataFrame = {
    import spark.implicits._
    require(coarseK >= k, s"coarseK ($coarseK) must be >= k ($k)")
    val m = Distances.metricId(metric)
    val probes = queries.flatMap { case (qid, qv) =>
      centroids.zipWithIndex
        .map { case (cv, ci) => (Distances.distance(m)(qv, cv), ci) }
        .sortBy(identity)
        .take(nprobe)
        .map { case (_, ci) => (qid, ci) }
    }.toSeq.toDF("qid", "cell")
    val queriesPre = queries.map { case (qid, qv) => (qid, qv.take(dPrefix)) }
      .toSeq.toDF("qid", "qp")
    val dPre = prefixCol.map(checkedCoarseCol(_, dPrefix, "prefix"))
      .getOrElse(slice(col("vector"), 1, dPrefix))
    val coarseRaw = assigned
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(queriesPre), Seq("qid"))
      .select(col("qid"), col("id"), vec.dist(dPre, col("qp"), metric).as("cdist"))
    val coarse = if (dedup) coarseRaw.dropDuplicates("qid", "id") else coarseRaw
    val w1 = Window.partitionBy("qid").orderBy(col("cdist"), col("id"))
    val cand = coarse.withColumn("r", row_number().over(w1)).filter(col("r") <= coarseK)
      .select("qid", "id")
    val queriesDf = queries.toSeq.toDF("qid", "qvec")
    val rescoredRaw = assigned.join(broadcast(cand), Seq("id"))
      .join(broadcast(queriesDf), Seq("qid"))
      .select(col("qid"), col("id"), vec.dist(col("vector"), col("qvec"), metric).as("dist"))
    val rescored = if (dedup) rescoredRaw.dropDuplicates("qid", "id") else rescoredRaw
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("id"))
    rescored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** [[matryoshkaIvf]] with a DataFrame query side — the corpus-vs-corpus
    * shape with both pruning levers and NOTHING driver-resident: each
    * query row computes its own probe cells ([[Ivf.probeCells]] —
    * centroids broadcast, optional HNSW coarse quantizer), both sides
    * shuffle once on the small-cardinality cell id, and a per-cell
    * cogroup streams the cell's PREFIX vectors (dPrefix/d of the bytes
    * with a materialized `prefixCol`) past bounded per-query coarse
    * heaps. Survivors rescore at full dimension through candidate-keyed
    * joins (coarseK·Q rows — bounded by the serving knobs, never the
    * corpus). Row-for-row equal to [[matryoshkaIvf]] given the same
    * knobs (same kernels, same (dist, id) tie-break).
    */
  def matryoshkaIvfDF(
      assigned: DataFrame, // output of Ivf.assign(): (id, cell, vector)
      centroids: Array[Array[Float]],
      queries: DataFrame, // (qid, qvec)
      k: Int, nprobe: Int, dPrefix: Int, coarseK: Int,
      metric: String = "euclidean",
      prefixCol: Option[String] = None,
      dedup: Boolean = false,
      coarse: String = "linear"): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    require(coarseK >= k, s"coarseK ($coarseK) must be >= k ($k)")
    val m = Distances.metricId(metric)
    val probes = Ivf.probeCells(queries, centroids, nprobe, metric, coarse)
      .map { case (cell, qid, qv) => (cell, qid, qv.take(dPrefix)) }
    val dPre = prefixCol.map(checkedCoarseCol(_, dPrefix, "prefix"))
      .getOrElse(slice(col("vector"), 1, dPrefix))
    val dataByCell = assigned
      .select(col("cell").cast("int"), col("id").cast("long"), dPre.cast("array<float>").as("vp"))
      .as[(Int, Long, Array[Float])]
      .groupByKey(_._1)
    val coarseCands = dataByCell.cogroup(probes.groupByKey(_._1)) { case (_, dIter, qIter) =>
      val qs = qIter.toArray
      if (qs.isEmpty) Iterator.empty
      else {
        val heaps = Array.fill(qs.length)(new TopK(coarseK))
        val kernel = Distances.distance(m) _
        TopK.scanBlocked(dIter.map { case (_, id, v) => (id, v) }, qs.map(_._3), heaps, kernel)
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.sorted.iterator.map { case (cdist, id) => (qs(qi)._2, id, cdist) }
        }
      }
    }.toDF("qid", "id", "cdist")
    val cdeduped = if (dedup) coarseCands.dropDuplicates("qid", "id") else coarseCands
    val w1 = Window.partitionBy("qid").orderBy(col("cdist"), col("id"))
    val cand = cdeduped.withColumn("r", row_number().over(w1)).filter(col("r") <= coarseK)
      .select("qid", "id")
    val rescoredRaw = assigned
      .select(col("id").cast("long"), col("vector").cast("array<float>"))
      .join(cand, Seq("id"))
      .join(queries.select(col("qid").cast("long"), col("qvec")), Seq("qid"))
      .select(col("qid"), col("id"), vec.dist(col("vector"), col("qvec"), metric).as("dist"))
    val rescored = if (dedup) rescoredRaw.dropDuplicates("qid", "id") else rescoredRaw
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("id"))
    rescored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** [[matryoshka]] with a DataFrame query side — the standalone
    * (train-free, no IVF assignment) tier at corpus-vs-corpus query
    * cardinality, with NOTHING driver-resident and NO crossJoin: the
    * coarse pass is [[partitionedDF]] over the prefix column (the query
    * table replicated through one shuffle onto the un-moved prefix scan,
    * per-query bounded heaps via `TopK.scanBlocked`; with a materialized
    * `prefixCol` the scan column-prunes to dPrefix/d of the vector
    * bytes), and the survivors rescore at full dimension through
    * candidate-keyed joins (coarseK·Q rows — bounded by the serving
    * knobs, never the corpus). Row-for-row equal to [[matryoshka]] given
    * the same knobs: same distance kernels, same total (cdist, id) /
    * (dist, id) tie-breaks at both stages.
    */
  def matryoshkaDF(data: DataFrame, queries: DataFrame, k: Int, dPrefix: Int,
      coarseK: Int, metric: String = "euclidean",
      prefixCol: Option[String] = None,
      queryBlock: Int = 1 << 16): DataFrame = {
    require(coarseK >= k, s"coarseK ($coarseK) must be >= k ($k)")
    val dPre = prefixCol.map(checkedCoarseCol(_, dPrefix, "prefix"))
      .getOrElse(slice(col("vector"), 1, dPrefix))
    val dataPre = data.select(col("id"), dPre.as("vector"))
    val qPre = queries.select(col("qid"), slice(col("qvec"), 1, dPrefix).as("qvec"))
    val cand = partitionedDF(dataPre, qPre, coarseK, metric, queryBlock)
      .select("qid", "id")
    val rescored = data
      .select(col("id").cast("long"), col("vector").cast("array<float>"))
      .join(cand, Seq("id"))
      .join(queries.select(col("qid").cast("long"), col("qvec")), Seq("qid"))
      .select(col("qid"), col("id"), vec.dist(col("vector"), col("qvec"), metric).as("dist"))
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("id"))
    rescored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact kNN via per-partition bounded heaps: ONE pass over the data
    * computes all query heaps per partition (`mapPartitions`), emitting only
    * k candidates per (partition, query). The global merge ranks the k·P·Q
    * candidate rows — equivalent to `storage/dataset.go:349`'s
    * sort-and-truncate over per-partition results. Hash-matches
    * [[bruteForce]] by construction (same distance kernel, same tie-break).
    */
  def partitioned(
      spark: SparkSession,
      data: DataFrame,
      queries: Array[(Long, Array[Float])],
      k: Int,
      metric: String = "euclidean"): DataFrame = {
    import spark.implicits._
    val m = Distances.metricId(metric)
    val bc = spark.sparkContext.broadcast(queries)

    val candidates = data
      .select(col("id").cast("long"), col("vector").cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val qs = bc.value
        val heaps = Array.fill(qs.length)(new TopK(k))
        // exact double element-ordered kernel (hash-matches the oracle
        // formulation); blocked scan keeps the query set out of the
        // per-row cache path (TopK.scanBlocked) without touching results
        val kernel = Distances.distance(m) _
        TopK.scanBlocked(iter, qs.map(_._2), heaps, kernel)
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.sorted.iterator.map { case (dist, id) => (qs(qi)._1, id, dist) }
        }
      }
      .toDF("qid", "id", "dist")

    val w = Window.partitionBy("qid").orderBy(col("dist"), col("id"))
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact kNN with a DataFrame query side — no driver-resident query array
    * anywhere. The query table (the small side) is replicated to every data
    * partition through one shuffle (`zipPartitions` against a pid-keyed
    * rebroadcast), the data (the big side) never moves, and each task emits
    * only k candidates per query. At 100 TB this is the right BNL
    * orientation: network cost is Q·P query rows, not data·chunks.
    *
    * The query batch is processed in fixed-size BLOCKS (`queryBlock` rows),
    * so task memory is bounded by max(one data partition, one query block
    * of heaps) — a 10M-query batch streams through block by block instead
    * of materializing 10M heaps at once. A batch that fits one block keeps
    * the original single-pass shape: the data partition is streamed, never
    * materialized. Multi-block batches materialize the data partition once
    * (its size is the task-memory contract everything else in Spark
    * already relies on) and re-scan it per block — compute cost is
    * identical (Q·N kernel calls), memory is what changes. For query sides
    * too large even for block replication economics, use the IVF cogroup
    * path, which replicates nothing.
    *
    * data: (id, vector), queries: (qid, qvec). Hash-matches [[bruteForce]]
    * at any block size (per-query heaps are independent of blocking).
    */
  def partitionedDF(
      data: DataFrame,
      queries: DataFrame,
      k: Int,
      metric: String = "euclidean",
      queryBlock: Int = 1 << 16): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val m = Distances.metricId(metric)
    require(queryBlock > 0, "queryBlock must be positive")

    val dataRdd = data
      .select(col("id").cast("long"), col("vector").cast("array<float>"))
      .as[(Long, Array[Float])].rdd
    val p = math.max(1, dataRdd.getNumPartitions)

    val qRep = queries
      .select(col("qid").cast("long"), col("qvec").cast("array<float>"))
      .as[(Long, Array[Float])].rdd
      .flatMap(q => Iterator.range(0, p).map(pid => (pid, q)))
      .partitionBy(new org.apache.spark.HashPartitioner(p))
      .values

    val candidates = dataRdd.zipPartitions(qRep) { (dIter, qIter) =>
      val kernel = Distances.distance(m) _
      def scanBlock(qs: Array[(Long, Array[Float])],
          rows: Iterator[(Long, Array[Float])]): Iterator[(Long, Long, Double)] = {
        val heaps = Array.fill(qs.length)(new TopK(k))
        TopK.scanBlocked(rows, qs.map(_._2), heaps, kernel)
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.sorted.iterator.map { case (dist, id) => (qs(qi)._1, id, dist) }
        }
      }
      // one grouped() pass owns qIter end to end — Iterator.take's contract
      // says the source must be discarded after use, so peeking the first
      // block via take-then-reuse is unspecified behavior
      val blocks = qIter.grouped(queryBlock).map(_.toArray)
      if (!blocks.hasNext) Iterator.empty
      else {
        val first = blocks.next()
        // hasNext buffers at most one more query block — same memory bound
        if (!blocks.hasNext) scanBlock(first, dIter) // single block: stream the data
        else {
          val items = dIter.toArray // multi-block: one partition-sized buffer, re-scanned per block
          (Iterator.single(first) ++ blocks).flatMap(qs => scanBlock(qs, items.iterator))
        }
      }
    }.toDF("qid", "id", "dist")

    val w = Window.partitionBy("qid").orderBy(col("dist"), col("id"))
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
