package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing: membership is a pure
  * function of the row id (md5-derived bucket in [0, 10000)), so samples
  * are exactly reproducible across engines, runs, and cluster sizes — no
  * RNG state, no partition-order sensitivity. The standard lever for
  * corpus mixing ratios in LLM data pipelines.
  */
object Sampling {

  /** Bucket in [0, 10000) from the id column (engine-portable md5 hash). */
  def bucket(id: Column, seed: String = "s"): Column =
    pmod(conv(substring(md5(concat(lit(seed), id.cast("string"))), 1, 15), 16, 10).cast("long"),
      lit(10000L))

  /** Keep ~fraction of rows, deterministically by id. */
  def sample(df: DataFrame, idCol: String, fraction: Double, seed: String = "s"): DataFrame =
    df.filter(bucket(col(idCol), seed) < (fraction * 10000).toLong)

  /** Per-stratum fractions (e.g. language mixing ratios); strata absent
    * from the map are dropped.
    */
  def sampleStratified(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      seed: String = "s"): DataFrame = {
    val threshold = fractions.foldLeft(lit(-1L)) { case (acc, (stratum, frac)) =>
      when(col(strataCol) === stratum, lit((frac * 10000).toLong)).otherwise(acc)
    }
    df.filter(bucket(col(idCol), seed) < threshold)
  }

  /** Per-group quota cap (C4-style domain quotas): keep at most `quota`
    * rows per `groupCol`, chosen deterministically by ascending
    * (hash-bucket, id) — so WHICH rows survive is a pure function of ids,
    * not of partition order, and a re-run on different hardware keeps the
    * same rows. One shuffle on the group key; `WindowGroupLimit` bounds
    * each partition's contribution before the exchange, so a mega-domain
    * (the skew case quotas exist for) never concentrates more than
    * quota·P rows anywhere.
    */
  def sampleQuota(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      quota: Int,
      seed: String = "s"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(bucket(col(idCol), seed), col(idCol))
    df.withColumn("__qrank", row_number().over(w))
      .filter(col("__qrank") <= quota)
      .drop("__qrank")
  }
}
