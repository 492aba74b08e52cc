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

  /** TEMPERATURE sampling — the multilingual/multi-source mixing rule
    * (sampling probability p_i ∝ n_i^alpha): alpha = 1 keeps natural
    * proportions, alpha → 0 flattens toward uniform across sources,
    * upsampling the tail the way multilingual pretraining re-balances
    * low-resource languages. `targetFraction` scales the whole mixture
    * (expected kept rows ≈ targetFraction · total); per-source keep
    * rates are capped at 1 (this operator only downsamples — repeat
    * epochs, not row duplication, are the upsampling mechanism).
    *
    * Deterministic end to end: rates derive from exact per-source counts
    * (one partial-agg shuffle, source-cardinality result collected —
    * sources are a handful at any corpus scale), membership is the same
    * md5 bucket rule as [[sample]] — reproducible across engines, runs,
    * and layouts, and mirrorable by the SQL oracle.
    */
  def sampleTemperature(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      alpha: Double,
      targetFraction: Double,
      seed: String = "s"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0), r.getLong(1)))
    val total = counts.map(_._2).sum.toDouble
    val weightSum = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    // p_i = n_i^alpha / Σ n_j^alpha; expected kept = targetFraction·total·p_i
    // ⇒ per-source rate = min(1, targetFraction·total·p_i / n_i)
    val rates = counts.map { case (g, n) =>
      g -> math.min(1.0, targetFraction * total * math.pow(n.toDouble, alpha) / weightSum / n)
    }
    val threshold = rates.foldLeft(lit(-1L)) { case (acc, (g, rate)) =>
      when(col(groupCol) === g, lit((rate * 10000).toLong)).otherwise(acc)
    }
    df.filter(bucket(col(idCol), seed) < threshold)
  }

  /** Mixture EPOCH PLANNING — the published-mixture accounting table
    * (LLaMA Table 1 / GPT-3 Table 2.2 report exactly these columns:
    * sampling proportion, disk size, epochs elapsed when training on the
    * given budget): given per-source available token counts, INTEGER
    * mixture weights (parts, not floats — the normalization `w / Σw` is
    * then an exact integer-ratio double, immune to float-summation
    * order), and the total training-token budget, emit per source the
    * drawn tokens `floor(w · budget / Σw)` (exact BIGINT arithmetic) and
    * the epoch count `drawn / available` — the over-sampling diagnostic a
    * mixture designer watches (epochs ≫ 1 on a small high-weight source
    * means memorization risk; the reference tables keep most sources
    * ≤ ~1.5).
    *
    * Scale shape: ONE groupBy(source) token-count pass over the corpus —
    * the only corpus-sized work — whose source-cardinality-sized result
    * is collected ONCE and drives both the missing-source check and the
    * output rows (a second plan consumption would silently re-scan the
    * corpus); every derived column is then local-table arithmetic.
    * Sources with no weight row are dropped (explicit mixture design); a
    * weighted source absent from the corpus raises.
    */
  def mixEpochs(
      docs: DataFrame,
      weights: DataFrame, // (source, weight) — integer parts
      budget: Long,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weights
      .select(col("source").cast("string"), col("weight").cast("long"))
      .as[(String, Long)].collect().sortBy(_._1)
    require(w.nonEmpty, "weights must be non-empty")
    require(w.map(_._1).distinct.length == w.length, "one weight row per source")
    require(w.forall(_._2 > 0), s"weights must be positive integer parts: ${w.toSeq}")
    // `weight * budget` runs in BIGINT inside the plan — guard the product
    // here so an oversized weight fails loudly instead of wrapping negative
    require(w.forall(_._2 <= Long.MaxValue / budget),
      s"mixEpochs: weight * budget would overflow BIGINT (max weight for budget=$budget " +
        s"is ${Long.MaxValue / budget}) — use smaller integer parts; only ratios matter")
    val totalWBig = w.iterator.map(x => BigInt(x._2)).sum
    require(totalWBig <= Long.MaxValue,
      s"mixEpochs: sum of weights $totalWBig overflows BIGINT — use smaller integer parts")
    val totalW = totalWBig.toLong
    val avail: Map[String, Long] = docs
      .groupBy(col(sourceCol).cast("string").as("source"))
      .agg(sum(size(split(trim(col(textCol)), "\\s+")).cast("long")).as("n_tokens"))
      .as[(String, Long)].collect().toMap
    val missing = w.map(_._1).filterNot(avail.contains)
    require(missing.isEmpty,
      s"mixEpochs: weighted sources absent from the corpus: ${missing.toSeq.sorted}")
    w.toSeq.map { case (s, wt) => (s, avail(s), wt) }
      .toDF("source", "n_tokens", "weight")
      .withColumn("weight_norm",
        round(col("weight").cast("double") / lit(totalW.toDouble), 6))
      // exact BIGINT floor-division (`div`), not float `/`-then-floor —
      // bit-exact at any magnitude and matched by DuckDB's `//`
      .withColumn("tokens_drawn",
        expr(s"(weight * ${budget}L) div ${totalW}L").cast("long"))
      .withColumn("epochs",
        round(col("tokens_drawn").cast("double") / col("n_tokens"), 4))
      .select(col("source"), col("n_tokens"), col("weight").cast("long"),
        col("weight_norm"), col("tokens_drawn"), col("epochs"))
  }

  /** The A-Res selection key ln(u)/w with u = (md5-derived h + 0.5)/2⁶⁰ —
    * a PURE per-row function of (seed, id, weight), shared verbatim by
    * [[sampleWeighted]] and the streaming
    * [[graft.streaming.StreamingOps.weightedSampleSink]] so the two forms
    * select byte-identical samples. Non-positive/null/NaN weights raise
    * (NaN must be caught explicitly: `NaN <= 0` is false, and a NaN key
    * would sort above every real key in descending order, silently
    * hijacking the sample).
    */
  def aresKey(idCol: String, weightCol: String, seed: String): Column = {
    val h = conv(substring(md5(concat(lit(seed), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("double")
    val u = (h + 0.5) / lit(math.pow(2, 60))
    when(col(weightCol).isNull || isnan(col(weightCol).cast("double")) || col(weightCol) <= 0,
        raise_error(concat(lit(s"sampleWeighted: non-positive or NaN weight in '$weightCol' for id "),
          col(idCol).cast("string"),
          lit(" — filter unwanted rows out instead of zero-weighting them"))))
      .otherwise(log(u) / col(weightCol).cast("double"))
  }

  /** WEIGHTED sampling without replacement (Efraimidis–Spirakis A-Res):
    * keep the k rows with the largest key u^(1/w) — computed in log space
    * as ln(u)/w — which selects each row with probability proportional to
    * its weight, exactly the executor DSIR-style importance resampling
    * needs once [[graft.text.TextAnalysis.dsirWeights]] (or any quality
    * scorer) has produced per-document weights. The uniform u derives
    * from the same md5 hash as [[bucket]] ((h + 0.5) / 2⁶⁰ — never 0, so
    * ln is finite), making the SAMPLE a pure function of ids:
    * reproducible across engines, runs, and partition layouts, and
    * mirrorable by a SQL oracle.
    *
    * Output: the selected rows plus `sample_rank` (1 = largest key).
    * Non-positive or null weights fail LOUDLY (a silent weight bug
    * otherwise skews the mixture): rows a caller wants excluded should
    * be filtered before sampling, not given weight 0.
    *
    * Scale shape: the selection is `orderBy(key).limit(k)` — Spark plans
    * TakeOrderedAndProject, a per-partition bounded top-k + driver merge
    * of k·P candidates, never a global sort. The rank window runs on the
    * k selected rows only. For k beyond driver-merge comfort
    * (`prefilterAbove`, default ~4M), a key-threshold from
    * `approxQuantile` pre-filters the candidates before the top-k: the
    * quantile's error bound is over-provisioned so ≥ k rows survive (and
    * that is VERIFIED — an unordered executor-side `limit(k).count()`
    * proves ≥ k survivors; fewer falls back to the direct path rather
    * than ever returning fewer/different rows), every dropped row has a
    * key strictly below the threshold so it cannot displace a survivor —
    * same keys, same order, bounded merge, identical output.
    */
  def sampleWeighted(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: String = "s",
      prefilterAbove: Int = 1 << 22): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(prefilterAbove > 0, s"prefilterAbove must be positive, got $prefilterAbove")
    val keyed = df.withColumn("__skey", aresKey(idCol, weightCol, seed))
    val candidates =
      if (k < prefilterAbove) keyed
      else {
        val total = keyed.count()
        if (total <= k) keyed
        else {
          // want the top k keys: threshold at the (1 - k/total) quantile,
          // shifted DOWN by twice the relative error so the bound
          // guarantees >= k survivors even at the estimate's worst rank
          val err = 0.001
          val p = math.max(0.0, 1.0 - k.toDouble / total - 2 * err)
          val thr = keyed.stat.approxQuantile("__skey", Array(p), err).head
          val pre = keyed.filter(col("__skey") >= thr)
          // survivor sufficiency: >= k rows past the threshold proves the
          // true top-k survived (every dropped key is strictly below thr,
          // which is at or below the k-th survivor). Verified by an
          // UNORDERED limit(k).count() — per-partition emission caps at k,
          // nothing sorts, nothing persists, and NOTHING lands on the
          // driver (the k rows can be corpus documents; collecting them
          // was a driver-OOM at exactly the multi-million-k scale this
          // path exists for). The filtered candidates flow lazily into the
          // shared top-k below — one more codegen key scan than a cached
          // plan, in exchange for zero cross-call cache residue.
          if (pre.limit(k).count() == k) pre else keyed
        }
      }
    candidates
      .orderBy(col("__skey").desc, col(idCol))
      .limit(k)
      .withColumn("sample_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("__skey").desc, col(idCol))))
      .drop("__skey")
  }

  /** TOKEN-BUDGET sampling — the mixing knob training runs actually
    * specify ("200B web tokens, 30B code tokens"), which per-doc
    * fractions and quotas only approximate when document lengths vary:
    * per source, documents are ranked by (md5 bucket, id) and a document
    * is kept iff the total whitespace-token count of every document
    * ranked before it is still below the source's budget — so each
    * source's kept set is the maximal deterministic prefix whose
    * cumulative size stays under budget (overshoot at most one document).
    * Sources absent from the map are dropped ([[sampleStratified]]'s
    * convention); a zero budget keeps nothing; a budget at or above the
    * source's total keeps the whole source.
    *
    * Scale shape: the cumulative sum is NOT one window over each source
    * (a single task per source at corpus scale). Phase 1 partial-aggs
    * token sums per (source, md5-bucket) — ≤ sources × 10000 rows to the
    * driver, corpus-size-free. The driver locates each source's BOUNDARY
    * bucket (the first whose cumulative total crosses the budget);
    * buckets strictly below pass wholesale with a stateless filter,
    * buckets above drop, and only the boundary bucket's ~1/10000 of the
    * source flows through the per-source cumsum window. Deterministic
    * end to end: membership is a pure function of (id, seed, budgets),
    * reproducible across engines and layouts, and mirrored by the SQL
    * oracle's single-window formulation (proven equivalent: a doc's
    * ranked-before total is the same number in both phrasings).
    *
    * Returns the kept rows with original columns.
    */
  def sampleTokenBudget(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      textCol: String,
      budgets: Map[String, Long],
      seed: String = "s"): DataFrame = {
    require(budgets.nonEmpty, "budgets must be non-empty")
    require(budgets.values.forall(_ >= 0), s"budgets must be >= 0: $budgets")
    val outCols = df.columns.map(col).toSeq
    val inBudget = budgets.keys.foldLeft(lit(false))((acc, g) =>
      acc || col(groupCol) === g)
    val base = df.filter(inBudget)
      .withColumn("__tok", size(split(trim(col(textCol)), "\\s+")).cast("long"))
      .withColumn("__b", bucket(col(idCol), seed))
    // phase 1: (source, bucket) token sums — bounded by sources × 10000
    val sums = base.groupBy(groupCol, "__b").agg(sum("__tok").as("t"))
      .collect().map(r => ((r.get(0).toString, r.getLong(1)), r.getLong(2))).toMap
    // driver: first bucket whose cumulative total crosses the budget
    val cutoffs = budgets.map { case (g, budget) =>
      var cum = 0L
      var cut = 10000L
      var before = 0L
      var i = 0L
      while (i < 10000 && cut == 10000L) {
        val t = sums.getOrElse((g, i), 0L)
        if (cum + t > budget) { cut = i; before = cum } else cum += t
        i += 1
      }
      (g, cut, before)
    }.toSeq
    def byGroup(f: ((String, Long, Long)) => Long): Column =
      cutoffs.foldLeft(lit(Long.MinValue)) { case (acc, c) =>
        when(col(groupCol) === c._1, lit(f(c))).otherwise(acc)
      }
    val cutCol = byGroup(_._2)
    val beforeCol = byGroup(_._3)
    val budgetCol = cutoffs.foldLeft(lit(Long.MinValue)) { case (acc, (g, _, _)) =>
      when(col(groupCol) === g, lit(budgets(g))).otherwise(acc)
    }
    val whole = base.filter(col("__b") < cutCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(idCol)
    val boundary = base.filter(col("__b") === cutCol)
      .withColumn("__cum", sum("__tok").over(w))
      .filter(beforeCol + col("__cum") - col("__tok") < budgetCol)
    whole.unionByName(boundary.drop("__cum")).select(outCols: _*)
  }

  /** [[sampleTokenBudget]] with budgets as a DataFrame — the
    * HIGH-SOURCE-CARDINALITY regime. At thousands of sources a
    * driver-built CASE chain is unwieldy AND unnecessary: per-source
    * windows parallelize ACROSS sources (each source's rows are few when
    * cardinality is high), so the plain single-window formulation is the
    * right plan here and the Map form's boundary-bucket machinery is the
    * few-huge-sources regime. `budgets` must carry (`groupCol`, budget)
    * columns; it broadcast-joins onto the corpus, so sources absent from
    * it drop ([[sampleStratified]]'s convention). Kept set identical to
    * the Map form for equal budgets (per-doc rank and rule are the same;
    * proven in ScalaTest).
    */
  def sampleTokenBudgetDF(
      df: DataFrame,
      budgets: DataFrame,
      idCol: String,
      groupCol: String,
      textCol: String,
      seed: String = "s"): DataFrame = {
    require(budgets.columns.contains(groupCol) && budgets.columns.contains("budget"),
      s"budgets must carry ($groupCol, budget) columns, got ${budgets.columns.mkString(", ")}")
    val outCols = df.columns.map(col).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(bucket(col(idCol), seed), col(idCol))
    df.join(broadcast(budgets.select(col(groupCol), col("budget").cast("long"))),
        Seq(groupCol))
      .withColumn("__tok", size(split(trim(col(textCol)), "\\s+")).cast("long"))
      .withColumn("__cum", sum("__tok").over(w))
      .filter(col("__cum") - col("__tok") < col("budget"))
      .select(outCols: _*)
  }
}
