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
}
