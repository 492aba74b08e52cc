package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SSL-prototype data pruning (Sorscher, Geirhos et al. 2022, "Beyond
  * neural scaling laws: beating power law scaling via data pruning"):
  * k-means prototypes over the embedding column, each example's
  * difficulty = distance to its assigned prototype, and the EASIEST
  * `pruneFraction` of each cluster — the most prototypical, most
  * redundant examples when data is abundant — is marked pruned. The
  * paper's result is that this self-supervised metric traces the best
  * known exponent-beating pruning curve at large data scale, which is
  * exactly the 100 TB regime this engine targets: prune per cluster, not
  * globally, so dense prototype neighborhoods shed redundancy while
  * sparse clusters keep their coverage.
  *
  * Scale shape: k-means rides [[graft.knn.Ivf.train]] (k-means‖ seeding,
  * sampled training as the offline-cost lever) and the assignment is
  * [[graft.knn.Ivf.assign]]'s one broadcast-centroid scan; the per-row
  * difficulty is computed in the same pass. The ONLY data exchange is one
  * hash shuffle on the cluster id for the per-cluster rank window
  * (sort-based, spillable; cluster sizes are corpus/c — pick c like an
  * IVF cell count). Ties on distance break by id, so the kept set is a
  * deterministic pure function of (data, c, seed, fraction).
  */
object Prototypes {

  /** Returns one row per input vector: (id, cluster, dist, keep) —
    * `keep = false` for the `floor(pruneFraction * clusterSize)` members
    * closest to their prototype (rank by (dist asc, id asc)). With
    * `pruneHardest = true` the FARTHEST members are pruned instead (rank
    * by (dist desc, id desc) — the FULL reverse of the easy-prune order,
    * id included, so the kept/pruned boundary is a strict cut in (dist,
    * id) lexicographic space even when identical vectors tie on
    * distance) — the paper's other regime: with scarce data, prune the
    * hardest examples (prototype-distant outliers, label noise and junk
    * in a web corpus) and keep the easy coverage.
    *
    * Cutoff arithmetic is IEEE-double: the pruned count is
    * `floor(pruneFraction.toDouble * n)` evaluated as a double product,
    * so a fraction whose double representation sits just below its
    * decimal value (e.g. 0.29 × 100 → 28, not 29) prunes one fewer than
    * decimal arithmetic would suggest. The same expression is what any
    * SQL engine evaluates for `floor(f * n)` on DOUBLE, so verification
    * across engines is consistent; callers needing a decimal-exact count
    * should pass a fraction with an exact binary representation
    * (k/2^m, e.g. 0.25, 0.3125) or pre-round `pruneFraction * n`
    * themselves.
    */
  def prunePrototypes(
      spark: SparkSession,
      vectors: DataFrame, // (id, vector)
      c: Int,
      pruneFraction: Double,
      metric: String = "euclidean",
      iterations: Int = 2,
      seeding: String = "kmeans||",
      sampleFraction: Double = 1.0,
      pruneHardest: Boolean = false): DataFrame = {
    require(pruneFraction >= 0.0 && pruneFraction < 1.0,
      s"pruneFraction must be in [0, 1), got $pruneFraction")
    import spark.implicits._
    val centroids = graft.knn.Ivf.train(spark, vectors, c, metric,
      iterations, seeding, sampleFraction = sampleFraction)
    val m = graft.core.Distances.metricId(metric)
    val bc = spark.sparkContext.broadcast(centroids)
    // one broadcast-centroid scan: cell argmin + the difficulty distance
    // in the same kernel pass (Ivf.assign discards the distance)
    val assigned = vectors
      .select(col("id").cast("long"), col("vector").cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val cs = bc.value
        val kernel = graft.core.DistKernel.best
        iter.map { case (id, v) =>
          var best = -1
          var bestDist = Double.MaxValue
          var i = 0
          while (i < cs.length) {
            val d = m match {
              case graft.core.Distances.Euclidean => kernel.euclidean(v, cs(i))
              case graft.core.Distances.Manhattan => kernel.manhattan(v, cs(i))
              case _ => kernel.cosine(v, cs(i))
            }
            if (d < bestDist) { bestDist = d; best = i }
            i += 1
          }
          // all-NaN distances: first cell, NaN difficulty raises below —
          // a corrupt vector must not silently rank anywhere
          if (best == -1) { best = 0 }
          (id, best, bestDist)
        }
      }
      .toDF("id", "cluster", "dist")
    val loudDist = when(isnan(col("dist")) || col("dist") === Double.MaxValue,
        raise_error(concat(lit("prunePrototypes: non-finite difficulty for id "),
          col("id").cast("string"), lit(" — corrupt vector; filter it out first"))))
      .otherwise(col("dist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster")
      .orderBy(
        if (pruneHardest) col("dist").desc else col("dist").asc,
        if (pruneHardest) col("id").desc else col("id").asc)
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("cluster")
    assigned
      .withColumn("dist", loudDist)
      .withColumn("__rank", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wc))
      .withColumn("keep", col("__rank") > floor(lit(pruneFraction) * col("__n")))
      .select(col("id"), col("cluster"), col("dist"), col("keep"))
  }
}
