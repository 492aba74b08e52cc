package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch mutation semantics of the reference's partitioned dataset
  * (`/root/reference/storage/dataset.go:238-348`): items are routed to
  * partitions by `hash(id) % P` (`dataset.go:537`) and applied as
  * insert/update/remove batches.
  *
  * Spark-first: routing is Spark's hash partitioning on the key (the shuffle
  * that `groupBy`/window induces IS the router); updates resolve by
  * latest-version-wins per key; removes are an anti-join. No driver-side
  * loops; every path is a shuffle on the key column only.
  */
object Mutations {

  /** Upsert: highest-version row per key wins; base wins version ties.
    *
    * Scale shape: the base is NEVER shuffled. The (small) update batch is
    * version-resolved with a window over itself, then applied to the base
    * via two broadcast joins — one streaming pass overlaying updated
    * columns, one semi/anti pass appending brand-new keys. The window
    * formulation (shuffle + sort of the full base per batch) dies at 100 TB;
    * this is the reference's routed in-place batchUpdate
    * (`storage/dataset.go:238-348`) re-expressed for immutable storage.
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String, version: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(version).desc)
    val u = updates
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")

    val dataCols = base.columns.filter(_ != key)
    val uRen = u.select(col(key) +: dataCols.map(c => col(c).as(s"__u_$c")): _*)

    // pass 1: overlay updates onto existing keys (broadcast hash join)
    val overlaid = base.join(broadcast(uRen), Seq(key), "left")
      .select(col(key) +: dataCols.map { c =>
        when(col(s"__u_$version").isNotNull && col(s"__u_$version") > col(version), col(s"__u_$c"))
          .otherwise(col(c)).as(c)
      }: _*)

    // pass 2: append updates whose key is absent from the base
    val matchedKeys = base.select(key).join(broadcast(u.select(key)), Seq(key), "left_semi")
    val newRows = u.join(broadcast(matchedKeys.distinct()), Seq(key), "left_anti")

    overlaid.unionByName(newRows.select(col(key) +: dataCols.map(col): _*))
  }

  /** Remove: anti-join on the key (reference `batchRemove`,
    * `dataset.go:325-348`). Skew-safe: broadcast the (small) removal set.
    */
  def remove(base: DataFrame, removals: DataFrame, key: String): DataFrame =
    base.join(broadcast(removals.select(key).distinct()), Seq(key), "left_anti")
}
