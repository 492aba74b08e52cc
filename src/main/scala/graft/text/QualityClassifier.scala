package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned quality-classifier stage — the fastText-style linear model most
  * published curation cascades end with (CCNet/GPT-3/LLaMA filter quality
  * with a linear classifier over cheap text features, trained on a
  * labeled high-vs-low-quality slice): logistic regression over the
  * pipeline's own quality signals, trained by DETERMINISTIC full-batch
  * gradient descent (fixed iteration count, fixed learning rate, zero
  * initialization) so the fitted weights — and therefore every score —
  * are an exact closed-form function of the training rows, replayable by
  * any engine (the catalog oracle reruns the identical GD in a recursive
  * CTE and must hash-match the scores).
  *
  * Scale shape: each GD iteration is ONE partial-aggregated pass
  * (`avg((p − y) · xᵢ)` per feature) over the training slice — the
  * standard distributed-LR shape; the driver holds only the weight
  * vector (features + 1 doubles). Scoring is a single codegen
  * projection — one dot product + sigmoid per row, no shuffle, no UDF.
  * Training slices are curated and bounded by design; `iters` bounds the
  * pass count regardless of data size.
  */
object QualityClassifier {

  /** Fit logistic-regression weights on `df`: label in [0,1] in
    * `labelCol`, numeric features in `featureCols`. Returns
    * `featureCols.length + 1` doubles — bias first — each rounded to 6
    * decimals so a replaying engine scores from the same weights. The
    * cross-engine agreement is PROBABILISTIC, not absolute: raw GD
    * trajectories differ across engines by float-sum order (~1e-12), so
    * a weight landing within that noise of a 0.5e-6 HALF_UP rounding
    * boundary can round differently on the two sides — rounding shrinks
    * the disagreement window from every ulp to ~1e-12/1e-6 of weight
    * space, it does not close it. A caller needing a hard guarantee
    * should compare scores with a tolerance instead of by hash.
    */
  def train(
      df: DataFrame,
      labelCol: String,
      featureCols: Seq[String],
      iters: Int = 15,
      lr: Double = 2.0): Array[Double] = {
    require(featureCols.nonEmpty, "featureCols must be non-empty")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lr > 0, s"lr must be positive, got $lr")
    val n = featureCols.length
    var w = Array.fill(n + 1)(0.0)
    // one narrow projection cached for the iteration loop: iters scans
    // of (label, features) only, never the full input row. Nulls fail
    // LOUDLY: a null label/feature silently vanishing from every avg()
    // would skew the fit with no error (the keepBestPerGroup lesson).
    def loud(c: String) = {
      val v = col(c).cast("double")
      when(v.isNull, raise_error(lit(
        s"QualityClassifier.train: null in '$c' — impute or filter before training, " +
          "a silently dropped row skews every gradient"))).otherwise(v)
    }
    val cached = df.select(
        loud(labelCol).as("__y") +:
          featureCols.zipWithIndex.map { case (c, i) => loud(c).as(s"__x$i") }: _*)
      .persist()
    try {
      require(cached.limit(1).count() > 0,
        "QualityClassifier.train: empty training slice — zero rows would return the " +
          "zero-initialized weights as if they were fitted")
      for (_ <- 0 until iters) {
        val z = (0 until n).foldLeft(lit(w(0)): Column) { (acc, i) =>
          acc + col(s"__x$i") * lit(w(i + 1))
        }
        val d = lit(1.0) / (lit(1.0) + exp(-z)) - col("__y")
        val aggs = avg(d).as("g0") +:
          (0 until n).map(i => avg(d * col(s"__x$i")).as(s"g${i + 1}"))
        val row = cached.agg(aggs.head, aggs.tail: _*).head()
        w = Array.tabulate(n + 1)(i => w(i) - lr * row.getDouble(i))
      }
    } finally cached.unpersist()
    w.map(x => java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
  }

  /** The fitted score as a codegen column: sigmoid(bias + w · features). */
  def scoreCol(features: Seq[Column], weights: Array[Double]): Column = {
    require(weights.length == features.length + 1,
      s"need ${features.length + 1} weights (bias first), got ${weights.length}")
    val z = features.zipWithIndex.foldLeft(lit(weights(0)): Column) { case (acc, (f, i)) =>
      acc + f.cast("double") * lit(weights(i + 1))
    }
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
