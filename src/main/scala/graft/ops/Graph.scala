package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Host-graph analytics over the link edges a web-crawl ingest emits —
  * the quality signal CommonCrawl-scale curation actually uses: a
  * host-level PageRank (Page et al. 1999, "The PageRank Citation
  * Ranking") ranks the crawl frontier and feeds per-domain quality
  * priors, exactly the role the public host-level ranks play for
  * RefinedWeb/CCNet-style pipelines.
  *
  * The reference engine has no graph surface at all (its query scope is
  * vector search, `storage/dataset.go:349-433`); this covers the
  * link-graph half of the same crawl platform, deterministic end to end
  * so a SQL oracle can replay every iteration.
  */
object Graph {

  /** PageRank by POWER ITERATION with a FIXED iteration count — fixed, not
    * convergence-tested, so the result is a pure function of the edge set
    * and both engines replay it bit-for-bit (a tolerance test would make
    * the iteration count data-dependent and the oracle's unrolling
    * impossible). Multi-edges collapse (the classic formulation is over
    * the link RELATION, not link multiplicity); dangling mass (rank
    * sitting on nodes with no out-edges) redistributes uniformly each
    * step, so total rank stays 1 and the result is a true distribution.
    *
    * Scale shape, per iteration: ONE shuffle join of the rank vector onto
    * the out-edge list keyed by src (both sides hash-partition on the
    * join key; ranks are node-sized, never corpus-sized), one partial
    * aggregation summing contributions per dst, and a 1-row dangling-mass
    * aggregate CROSS JOINED back (a broadcast of one row — never a driver
    * collect inside the loop). Lineage is truncated per iteration with a
    * lazy localCheckpoint so plan depth stays constant at any iteration
    * count; the final vector is checkpointed eagerly and the cached edge
    * tables freed, leaving zero cache residue.
    *
    * Division happens per-edge as `rank / deg` (not a pre-inverted
    * `rank * (1/deg)`): one IEEE rounding per term, the same arithmetic a
    * SQL replay computes, so the two engines diverge only by summation
    * order — ulps, absorbed by the caller's final rounding.
    *
    * `edges` needs `srcCol`/`dstCol`; returns (node, rank) over every
    * node appearing on either side.
    */
  def pagerank(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iterations: Int = 10,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"pagerank: iterations must be >= 1, got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"pagerank: damping must be in (0, 1), got $damping")

    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    // ONE setup-time scalar (node count) — O(1) result, outside the loop
    val n = nodes.count().toDouble
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("double").as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // out-edges with the source's degree attached once, reused every
    // iteration (the per-iteration join then carries only the rank)
    val ew = e.join(outdeg.withColumnRenamed("node", "src"), "src")
      .select(col("src"), col("dst"), col("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val base = (1.0 - damping) / n
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
      .localCheckpoint(false)
    // intermediate checkpoints, freed only AFTER the final eager
    // materialization (unpersisting a lazy checkpoint before the chain
    // materializes would recompute it from truncated-away lineage)
    val intermediates = scala.collection.mutable.ArrayBuffer(ranks)
    for (it <- 1 to iterations) {
      val contribs = ranks.join(ew, ranks("node") === ew("src"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("contrib"))
      // rank currently sitting on dangling nodes — a 1-row aggregate
      // (coalesce: a graph with no dangling nodes sums over nothing)
      val dangling = ranks.join(outdeg, Seq("node"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0)).as("dm"))
      val next = nodes.join(contribs, nodes("node") === contribs("dst"), "left")
        .crossJoin(dangling)
        .select(nodes("node"),
          (lit(base) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("dm") / n)).as("rank"))
      // last iteration checkpoints EAGERLY so the caches below can be
      // freed before the caller ever materializes the result
      ranks = next.localCheckpoint(eager = it == iterations)
      if (it < iterations) intermediates += ranks
    }
    // the final vector is materialized — every helper table and every
    // per-round checkpoint is dead weight now (zero cache residue).
    // Dataset.unpersist only clears CacheManager entries; a checkpointed
    // Dataset's blocks live on its internal RDD (the LogicalRDD leaf), so
    // that RDD is what must be unpersisted
    intermediates.foreach(freeCheckpoint)
    ew.unpersist(); outdeg.unpersist(); nodes.unpersist(); e.unpersist()
    ranks
  }

  /** Release the block storage behind a localCheckpoint'ed Dataset (its
    * plan is a LogicalRDD leaf over the checkpointed RDD — unpersisting
    * the DATASET is a CacheManager no-op for it).
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
