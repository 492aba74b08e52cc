package graft.knn

import graft.core.Distances
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** IVF-Flat approximate nearest neighbors: partition the vector space into
  * C Voronoi cells (centroids from Lloyd iterations), assign every vector to
  * its nearest centroid, and at query time probe only the `nprobe` nearest
  * cells. This is the scale path for similarity search: the shuffle key is
  * the (small-cardinality) cell id, queries touch nprobe/C of the data, and
  * with nprobe = C the search degrades gracefully to exact kNN.
  */
object Ivf {

  /** Deterministic centroid training: seed with the first C vectors (by id),
    * then `iterations` Lloyd steps. Each step is one distributed pass:
    * assign (mapPartitions, broadcast centroids) + per-cell mean
    * (posexplode + groupBy(cell, dim) partial-agg). Centroid count C is
    * driver-sized (C·dim doubles), never the data.
    */
  def train(
      spark: SparkSession,
      data: DataFrame, // (id, vector)
      c: Int,
      metric: String = "euclidean",
      iterations: Int = 2): Array[Array[Float]] = {
    import spark.implicits._
    var centroids = data.orderBy("id").limit(c)
      .select("vector").as[Array[Float]].collect()
    // fewer rows than requested cells: train with what exists (cEff cells)
    val cEff = centroids.length
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    if (cEff == 0) return centroids

    // Each Lloyd step is ONE pass: per-partition (C×dim) sum vectors +
    // counts, tree-reduced to the driver. No positional explode — the
    // explode formulation shuffles N×dim rows (dim× amplification), this
    // moves only C×dim×P doubles.
    (0 until iterations).foreach { _ =>
      val (sums, counts) = assign(spark, data, centroids, metric)
        .select(col("cell"), col("vector"))
        .as[(Int, Array[Float])]
        .rdd
        .mapPartitions { iter =>
          val s = Array.ofDim[Double](cEff, dim)
          val n = new Array[Long](cEff)
          iter.foreach { case (cell, v) =>
            n(cell) += 1
            var i = 0
            while (i < dim) { s(cell)(i) += v(i); i += 1 }
          }
          Iterator.single((s, n))
        }
        .treeReduce { case ((s1, n1), (s2, n2)) =>
          var ci = 0
          while (ci < cEff) {
            var i = 0
            while (i < dim) { s1(ci)(i) += s2(ci)(i); i += 1 }
            n1(ci) += n2(ci)
            ci += 1
          }
          (s1, n1)
        }
      centroids = Array.tabulate(cEff) { ci =>
        if (counts(ci) == 0) centroids(ci)
        else Array.tabulate(dim)(i => (sums(ci)(i) / counts(ci)).toFloat)
      }
    }
    centroids
  }

  /** Assign each vector to its nearest centroid (ties → lowest cell id).
    * Single `mapPartitions` pass, centroids broadcast.
    */
  def assign(
      spark: SparkSession,
      data: DataFrame,
      centroids: Array[Array[Float]],
      metric: String = "euclidean"): DataFrame = {
    import spark.implicits._
    val m = Distances.metricId(metric)
    val bc = spark.sparkContext.broadcast(centroids)
    data.select(col("id").cast("long"), col("vector").cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val cs = bc.value
        // cell assignment only picks the argmin — SIMD kernel is safe here
        // (nprobe=C exactness is unaffected by which cell a vector lands in)
        val kernel = graft.core.DistKernel.best
        iter.map { case (id, v) =>
          var best = 0
          var bestDist = Double.MaxValue
          var i = 0
          while (i < cs.length) {
            val d = m match {
              case Distances.Euclidean => kernel.euclidean(v, cs(i))
              case Distances.Manhattan => kernel.manhattan(v, cs(i))
              case _ => kernel.cosine(v, cs(i))
            }
            if (d < bestDist) { bestDist = d; best = i }
            i += 1
          }
          (id, best, v)
        }
      }
      .toDF("id", "cell", "vector")
  }

  /** Persist an IVF index: cell-partitioned assignment parquet (searches
    * prune to probed cells via partition pruning) + centroid parquet.
    */
  def save(spark: SparkSession, assigned: DataFrame, centroids: Array[Array[Float]], dir: String): Unit = {
    import spark.implicits._
    assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/assigned")
    centroids.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cell", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Load a persisted IVF index: (assigned, centroids). */
  def load(spark: SparkSession, dir: String): (DataFrame, Array[Array[Float]]) = {
    import spark.implicits._
    val assigned = spark.read.parquet(s"$dir/assigned")
    val centroids = spark.read.parquet(s"$dir/centroids")
      .select("cell", "centroid").as[(Int, Seq[Float])].collect()
      .sortBy(_._1).map(_._2.toArray)
    (assigned, centroids)
  }

  /** IVF search: per query, probe the `nprobe` nearest cells; brute-force
    * only within those cells; global top-k via the candidate window.
    * Returns (qid, id, dist, rank).
    */
  def search(
      spark: SparkSession,
      assigned: DataFrame, // output of assign()
      centroids: Array[Array[Float]],
      queries: Array[(Long, Array[Float])],
      k: Int,
      nprobe: Int,
      metric: String = "euclidean"): DataFrame = {
    import spark.implicits._
    val m = Distances.metricId(metric)

    // (qid, cell) probe pairs — tiny, computed on the driver like the
    // reference's query-time partition fan-out (storage/dataset.go:390).
    val probes = queries.flatMap { case (qid, qv) =>
      centroids.zipWithIndex
        .map { case (cv, ci) => (Distances.distance(m)(qv, cv), ci) }
        .sortBy(identity)
        .take(nprobe)
        .map { case (_, ci) => (qid, ci) }
    }.toSeq.toDF("qid", "cell")

    val queriesDf = queries.toSeq.toDF("qid", "qvec")

    val candidates = assigned
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(queriesDf), Seq("qid"))
      .select(col("qid"), col("id"),
        graft.functions.vec.dist(col("vector"), col("qvec"), metric).as("dist"))

    val w = Window.partitionBy("qid").orderBy(col("dist"), col("id"))
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF search with a DataFrame query side — the corpus-vs-corpus shape
    * (e.g. dedup-by-ANN of one 100 TB table against another). Nothing is
    * driver-resident and nothing is replicated: each query row computes its
    * own nprobe probe cells (centroids broadcast — C·dim floats), both sides
    * shuffle once on the small-cardinality cell id, and a per-cell cogroup
    * streams the cell's vectors once past bounded per-query heaps, emitting
    * k candidates per (query, probed cell). Task memory is the cell's probe
    * set (≈ Q·nprobe/C queries), never the data.
    *
    * With nprobe = centroids.length every cell is probed and the result is
    * exactly [[graft.knn.Knn.bruteForce]] (same kernel, same tie-break).
    */
  def searchDF(
      assigned: DataFrame, // output of assign()
      centroids: Array[Array[Float]],
      queries: DataFrame, // (qid, qvec)
      k: Int,
      nprobe: Int,
      metric: String = "euclidean"): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val m = Distances.metricId(metric)
    val bc = spark.sparkContext.broadcast(centroids)

    val probes = queries
      .select(col("qid").cast("long"), col("qvec").cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val cs = bc.value
        val kernel = Distances.distance(m) _
        iter.flatMap { case (qid, qv) =>
          cs.zipWithIndex
            .map { case (cv, ci) => (kernel(qv, cv), ci) }
            .sortBy(identity)
            .take(nprobe)
            .iterator.map { case (_, ci) => (ci, qid, qv) }
        }
      }

    val dataByCell = assigned
      .select(col("cell").cast("int"), col("id").cast("long"), col("vector").cast("array<float>"))
      .as[(Int, Long, Array[Float])]
      .groupByKey(_._1)

    val candidates = dataByCell.cogroup(probes.groupByKey(_._1)) { case (_, dIter, qIter) =>
      val qs = qIter.toArray
      if (qs.isEmpty) Iterator.empty
      else {
        val heaps = Array.fill(qs.length)(new TopK(k))
        val kernel = Distances.distance(m) _
        dIter.foreach { case (_, id, v) =>
          var qi = 0
          while (qi < qs.length) { heaps(qi).push(kernel(v, qs(qi)._3), id); qi += 1 }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.sorted.iterator.map { case (dist, id) => (qs(qi)._2, id, dist) }
        }
      }
    }.toDF("qid", "id", "dist")

    val w = Window.partitionBy("qid").orderBy(col("dist"), col("id"))
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
