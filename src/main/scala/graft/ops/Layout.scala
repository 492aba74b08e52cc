package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the storage-side lever
  * the rest of the engine's query operators assume at 100 TB: parquet
  * row-group (and file-level) min/max statistics prune a predicate on a
  * column only when the layout CLUSTERS that column, and sorting clusters
  * exactly one column. Z-ORDERING interleaves the bits of several
  * columns' quantized ranks into one clustering key, so a range predicate
  * on ANY of the z-columns hits a small fraction of files — the same
  * trade Delta's OPTIMIZE ZORDER and ClickHouse projection keys make.
  *
  * Quantization here is min–max linear scaling to 2^bits ranks (one exact
  * aggregate pass — deterministic, engine-portable, oracle-checkable),
  * which clusters well for roughly-uniform columns; heavily skewed
  * columns keep correctness (the key is only a LAYOUT hint) but cluster
  * proportionally to their value spread — quantile-based ranks would
  * handle skew at the cost of a deterministic-cutpoint pass.
  */
object Layout {

  /** The z-value (Morton key) of `cols` under min–max quantization to
    * `bits` bits per column: bit j of column i's rank lands at output bit
    * j·n + i. Pure integer/double arithmetic on exact aggregates —
    * bit-identical across engines. `bits`·n must fit a long (≤ 62).
    */
  def zvalue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double], bits: Int): Column = {
    val n = cols.length
    require(n >= 1, "zvalue needs at least one column")
    require(bits >= 1 && bits * n <= 62, s"bits*cols must fit a long, got ${bits}x$n")
    val maxRank = (1L << bits) - 1
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = (mins(i), maxs(i))
      if (hi == lo) lit(0L) // constant column: every row rank 0
      else least(greatest(
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(maxRank.toDouble)).cast("long"),
        lit(0L)), lit(maxRank))
    }
    ranks.zipWithIndex.map { case (r, i) =>
      (0 until bits).map { j =>
        shiftleft(shiftright(r, j).bitwiseAND(lit(1L)), j * n + i)
      }.reduce(_ + _)
    }.reduce(_ + _).as("zvalue")
  }

  /** Re-layout `df` clustered by the z-order of `cols`: ONE exact
    * min/max aggregate pass (driver sees 2·n doubles), then
    * `repartitionByRange` + `sortWithinPartitions` on the z-value — a
    * single range-shuffle whose sampling only affects partition
    * BOUNDARIES, never membership semantics. Write the result with any
    * sink; parquet min/max stats on every z-column then prune range
    * predicates on any of them. Row content is untouched (the z-value
    * column is dropped after clustering).
    */
  def zorder(df: DataFrame, colNames: Seq[String], bits: Int = 12,
      nPartitions: Int = 0): DataFrame = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__min_$c"), max(col(c).cast("double")).as(s"__max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    require(!row.anyNull,
      s"zorder: null min/max for ${colNames.mkString(", ")} — empty input or all-null column")
    val mins = colNames.indices.map(i => row.getDouble(2 * i))
    val maxs = colNames.indices.map(i => row.getDouble(2 * i + 1))
    val keyed = df.withColumn("__z", zvalue(colNames.map(col), mins, maxs, bits))
    val parts = if (nPartitions > 0) keyed.repartitionByRange(nPartitions, col("__z"))
      else keyed.repartitionByRange(col("__z"))
    parts.sortWithinPartitions("__z").drop("__z")
  }
}
