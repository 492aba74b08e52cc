package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ARPA n-gram language-model IMPORT and Katz-backoff scoring.
  *
  * CCNet-style pipelines (Wenzek et al. 2020) score crawl documents with a
  * PRETRAINED KenLM model, not a corpus-self-trained one —
  * [[TextAnalysis.lmCrossEntropy]] / [[TextAnalysis.lmCrossEntropyBigram]]
  * cover the self-trained shape; this object lets a user bring the
  * published artifact. The ARPA text format (SRILM/KenLM interchange;
  * documented in the SRILM ngram-format man page) is:
  *
  * {{{
  * \data\
  * ngram 1=N1
  * ngram 2=N2
  *
  * \1-grams:
  * log10p<TAB>word<TAB>backoff
  * \2-grams:
  * log10p<TAB>w1 w2
  * \end\
  * }}}
  *
  * Every DATA line is SELF-DESCRIBING under tab-splitting — field 2's
  * space-separated word count IS the line's order, field 3 (optional) is
  * the backoff weight — so the parse is fully distributed and stateless:
  * no section-state threading across partition boundaries, a model file
  * splits like any text file. Header/section/blank lines are recognized
  * by shape and dropped; anything line-shaped that fails to parse raises
  * with the offending line (fail-loud, matching the WARC source's
  * discipline). `strict = true` (default) additionally validates the
  * parsed per-order row counts against the `\data\` declarations — the
  * cheap end-to-end torn-file check, one model-sized aggregation.
  *
  * Scoring implements the standard Katz back-off recursion the format
  * encodes (in log10, additive):
  *
  *   P(w | h)  =  p(h·w)                     if h·w is in the table
  *             =  bow(h) + P(w | tail(h))    otherwise, bow absent = 0
  *
  * with `<s>`/`</s>` sentence framing (every real token plus `</s>` is
  * scored; `<s>` only conditions) and out-of-vocabulary words scoring as
  * `<unk>` when the model carries one (KenLM always does), else at the
  * documented `unkLog10p` floor.
  *
  * Scale shape: the model's order-k tables join the corpus's position
  * table on (context, word) — hash-shuffle joins, deliberately NOT
  * broadcast (a CCNet KenLM artifact is GBs; the unigram level alone is
  * broadcast-eligible and AQE picks that up when small). Positions are
  * assembled NARROWLY per document (one `transform` over the framed token
  * array — no window, no doc-keyed shuffle before the final per-doc
  * aggregation), so the corpus streams once into 2·order−1 keyed joins
  * whose build sides are all model-bounded, never corpus-bounded.
  */
object ArpaLm {

  /** Parse ARPA lines into (order, context, word, log10p, backoff).
    * `context` is the space-joined n-gram prefix ("" for unigrams),
    * `backoff` is 0.0 where the line carries none (the format's own
    * convention for "no continuation mass"). Accepts `inf`/`-inf`
    * spellings some toolchains emit. With `strict`, eagerly validates
    * parsed counts against the `\data\` declarations.
    */
  def parse(lines: DataFrame, lineCol: String = "line", strict: Boolean = true): DataFrame = {
    val raw = lines.select(col(lineCol).cast("string").as("line"))
    // data lines start with the log10 probability: a number or ±inf
    val isData = col("line").rlike("^(-?[0-9]|-?\\.[0-9]|-?inf)")
    def num(c: Column, what: String): Column = {
      val t = trim(c)
      when(t === "inf", lit(Double.PositiveInfinity))
        .when(t === "-inf", lit(Double.NegativeInfinity))
        // try_cast, not cast: ANSI cast would throw its own error without
        // the offending LINE; the raise here names it
        .otherwise(coalesce(t.try_cast("double"), raise_error(
          concat(lit(s"arpa: unparseable $what in data line: "), col("line")))))
    }
    val parts = split(col("line"), "\t")
    // the structural checks live INSIDE materialized output columns
    // (word / backoff) — a dead side-column would be pruned by Catalyst
    // and the validation would silently never run
    // try_element_at, not element_at: ANSI element_at would throw its own
    // opaque index error on a tab-less data line before the dedicated
    // raise below could name the offending line
    val parsed = raw.filter(isData)
      .withColumn("__nf", size(parts))
      .withColumn("ws", split(trim(coalesce(try_element_at(parts, lit(2)), lit(""))), " "))
      .select(
        size(col("ws")).as("order"),
        when(size(col("ws")) > 1, concat_ws(" ", slice(col("ws"), lit(1), size(col("ws")) - 1)))
          .otherwise(lit("")).as("context"),
        when(col("__nf") < 2 || col("__nf") > 3, raise_error(concat(
            lit("arpa: data line needs 2 or 3 tab-separated fields: "), col("line"))))
          // empty/whitespace n-gram fields and doubled separators both
          // surface as an empty word — a phantom '' entry would silently
          // join real positions downstream, so fail loud here
          .when(array_contains(col("ws"), ""), raise_error(concat(
            lit("arpa: empty word in n-gram field: "), col("line"))))
          .otherwise(element_at(col("ws"), -1)).as("word"),
        num(element_at(parts, 1), "log10p").as("log10p"),
        when(col("__nf") === 3, num(try_element_at(parts, lit(3)), "backoff"))
          .when(col("__nf") === 2, lit(0.0))
          .otherwise(raise_error(concat(
            lit("arpa: data line needs 2 or 3 tab-separated fields: "), col("line"))))
          .as("backoff"))
    if (strict) {
      val declared = raw
        .filter(col("line").rlike("^ngram [0-9]+=[0-9]+\\s*$"))
        .select(regexp_extract(col("line"), "^ngram ([0-9]+)=([0-9]+)", 1).cast("int").as("order"),
          regexp_extract(col("line"), "^ngram ([0-9]+)=([0-9]+)", 2).cast("long").as("declared"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      require(declared.nonEmpty,
        "arpa: no \\data\\ ngram count declarations found — not an ARPA file (or pass strict=false)")
      val counted = parsed.groupBy("order").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val diffs = (declared.keySet ++ counted.keySet).toSeq.sorted.flatMap { k =>
        val (d, c) = (declared.getOrElse(k, 0L), counted.getOrElse(k, 0L))
        if (d != c) Some(s"order $k: declared $d, parsed $c") else None
      }
      require(diffs.isEmpty, s"arpa: \\data\\ counts disagree with parsed lines (torn or " +
        s"corrupt model file): ${diffs.mkString("; ")}")
    }
    parsed
  }

  /** TRAIN an interpolated Kneser–Ney BIGRAM model (Chen & Goodman 1999
    * §3, the smoothing family KenLM implements — CCNet's filter models
    * are exactly such artifacts), emitted in [[parse]]'s model shape and
    * therefore directly scorable by [[score]] and exportable by
    * [[format]]: the full train → export → import → score loop.
    *
    * The published formulation, stored in ARPA's backoff form (SRILM's
    * `-interpolate` convention — seen n-grams store the INTERPOLATED
    * probability; the backoff weight then covers exactly the unseen
    * mass, so probabilities sum to 1 per context, which KnTrainSpec
    * machine-checks):
    *
    *   D₂ = n₁/(n₁+2n₂) over bigram count-of-counts
    *   D₁ = n₁/(n₁+2n₂) over continuation-count count-of-counts
    *   p(w|v)  = (max(c(vw)−D₂, 0) + D₂·N1+(v·)·p(w)) / c(v·)
    *   bow(v)  = D₂·N1+(v·) / c(v·)
    *   p(w)    = (max(N1+(·w)−D₁, 0) + D₁·C·u) / N1+(··)   u = 1/(C+1)
    *   p(unk)  =  D₁·C·u / N1+(··)
    *
    * with N1+ the Kneser–Ney CONTINUATION counts (distinct left/right
    * extensions — the insight that "Francisco" is frequent but follows
    * only "San"), C the number of distinct continuation types, and the
    * unigram level interpolated against the uniform distribution over
    * the C observed types plus `<unk>` — the KenLM move that gives
    * `<unk>` the principled leftover mass instead of an arbitrary
    * floor. `<s>` is context-only (log10 p = −99, SRILM's spelling) but
    * carries a real backoff weight; `</s>` ends every document and is
    * never a context (backoff 0).
    *
    * Scale shape: one corpus pass assembles bigram positions narrowly
    * per document (the [[TextAnalysis.lmCrossEntropyBigram]] zip shape —
    * no window, no doc-keyed shuffle); every later table is bounded by
    * BIGRAM-TYPE cardinality, not corpus size: the count table is one
    * partial-agg shuffle, context totals / continuation counts are
    * re-aggregations of it, the two discount constants are count-of-
    * count scalars (driver holds two doubles), and the model emission
    * is type-table joins. Degenerate corpora (every bigram count ≥ 3,
    * so n₁ = n₂ = 0) fail loud rather than divide by zero.
    */
  def trainKneserNeyBigram(
      docs: DataFrame,
      textCol: String = "text"): DataFrame = trainKneserNey(docs, 2, textCol)

  /** TRAIN an interpolated Kneser–Ney model of ANY order ≥ 2 — the
    * general form of [[trainKneserNeyBigram]] (which delegates here;
    * CCNet's production artifacts are 5-gram models of exactly this
    * family). The recursion follows Chen & Goodman: the TOP level uses
    * actual n-gram counts; each lower level uses CONTINUATION counts —
    * the number of distinct left-extension types, computed by
    * suffix-grouping the level above's TYPE table — except that grams
    * beginning with `<s>` keep their actual counts (they cannot be
    * left-extended; SRILM's convention). Per-level discounts come from
    * that level's own count-of-counts; probabilities interpolate
    * downward through the shortened context (stored in ARPA's
    * interpolated-backoff form, so each level's per-context mass sums
    * to 1 — KnTrainSpec machine-checks the full cascade); the unigram
    * level interpolates against the uniform-plus-`<unk>` distribution.
    *
    * Scale shape: one corpus position pass PER LEVEL builds the actual
    * type tables (the only corpus-keyed shuffles); every adjusted
    * table, context total, and discount is a re-aggregation of a TYPE
    * table, bounded by type cardinality, never corpus size; the model
    * emits through type-table joins and every quantity derives from
    * exact integer counts, so the model is layout-independent by
    * construction. Degenerate corpora with no singleton counts at some
    * level fail loud (the discount is undefined there).
    */
  def trainKneserNey(
      docs: DataFrame,
      order: Int,
      textCol: String = "text"): DataFrame = {
    require(order >= 2, s"order must be >= 2, got $order")
    val spark = docs.sparkSession
    import spark.implicits._
    // drop empty tokens before framing: whitespace tokenization of an
    // empty document yields one '' token, which must NOT become a vocab
    // word (it would also be unrepresentable in the ARPA text format);
    // an empty document thus trains exactly the (<s>, </s>) bigram
    val seq = concat(array(lit("<s>")),
      filter(TextAnalysis.tokens(col(textCol)), t => t =!= ""), array(lit("</s>")))
    val framed = docs.select(seq.as("__seq"))

    // actual k-gram TYPE counts — one narrow position pass, one
    // type-keyed shuffle
    def actualCounts(k: Int): DataFrame =
      framed.filter(size(col("__seq")) >= k)
        .select(explode(transform(sequence(lit(k), size(col("__seq"))), i => struct(
          concat_ws(" ", slice(col("__seq"), i - (k - 1), lit(k - 1))).as("ctx"),
          element_at(col("__seq"), i).as("w")))).as("g"))
        .select(col("g.ctx").as("ctx"), col("g.w").as("w"))
        .groupBy("ctx", "w").agg(count(lit(1)).as("c"))

    def discount(counts: DataFrame): Double = {
      val r = counts.agg(
        coalesce(sum(when(col("c") === 1, 1L).otherwise(0L)), lit(0L)).as("n1"),
        coalesce(sum(when(col("c") === 2, 1L).otherwise(0L)), lit(0L)).as("n2")).head()
      val (n1, n2) = (r.getLong(0), r.getLong(1))
      require(n1 > 0, "kneser-ney: no singleton counts (n1 = 0) — the " +
        "Chen-Goodman discount n1/(n1+2*n2) is undefined on this corpus")
      n1.toDouble / (n1 + 2.0 * n2)
    }

    // level tables, top down: T(order) actual; T(k) = suffix-grouped
    // T(k+1) (continuation types) ∪ actual <s>-initial k-grams (which
    // never arise as suffixes — <s> only ever opens a gram)
    val tables = scala.collection.mutable.Map(order -> actualCounts(order).cache())
    for (k <- order - 1 to 2 by -1) {
      val fromCont = tables(k + 1)
        .select(concat_ws(" ", slice(split(col("ctx"), " "), 2, k - 1)).as("ctx"), col("w"))
        .groupBy("ctx", "w").agg(count(lit(1)).as("c"))
      val sInit = actualCounts(k)
        .filter(col("ctx") === "<s>" || col("ctx").startsWith("<s> "))
      tables(k) = fromCont.unionByName(sInit).cache()
    }
    val t1 = tables(2).groupBy("w").agg(count(lit(1)).as("c")).cache()

    val dk = (2 to order).map(k => k -> discount(tables(k))).toMap
    val d1 = discount(t1)
    val contTot = t1.agg(sum("c"), count(lit(1))).head()
    val t = contTot.getLong(0).toDouble // N1+(..)
    val cTypes = contTot.getLong(1).toDouble // C
    val u = 1.0 / (cTypes + 1.0)

    // unigram level: interpolated continuation PROBABILITIES kept raw,
    // so each level's interpolation uses the identical value the model
    // row logs — no pow∘log10 round trip, and the oracle mirrors this
    val p1 = t1.select(col("w"),
      ((greatest(col("c").cast("double") - d1, lit(0.0)) + lit(d1 * cTypes * u)) / t)
        .as("pd"))

    // upward build: pk table (ctx, w, pd), ctx totals, per-level bows
    val ctxTot = (2 to order).map { k =>
      k -> tables(k).groupBy("ctx").agg(sum("c").as("cv"), count(lit(1)).as("n1v"))
    }.toMap
    val bowOf = (2 to order).map { k =>
      k -> ctxTot(k).select(col("ctx"),
        (log10(lit(dk(k))) + log10(col("n1v").cast("double")) - log10(col("cv").cast("double")))
          .as("bow"))
    }.toMap
    val probs = scala.collection.mutable.Map(1 -> p1)
    for (k <- 2 to order) {
      val prev = probs(k - 1)
      val joined =
        if (k == 2) tables(k).join(ctxTot(k), Seq("ctx")).join(prev, Seq("w"))
        else tables(k).join(ctxTot(k), Seq("ctx"))
          .join(prev.select(col("ctx").as("__pctx"), col("w").as("__pw"), col("pd")),
            concat_ws(" ", slice(split(col("ctx"), " "), 2, k - 2)) === col("__pctx")
              && col("w") === col("__pw"))
      probs(k) = joined.select(col("ctx"), col("w"),
        ((greatest(col("c").cast("double") - dk(k), lit(0.0))
          + lit(dk(k)) * col("n1v").cast("double") * col("pd"))
          / col("cv").cast("double")).as("pd"))
      // middle levels feed BOTH their own emission and the next level's
      // interpolation join — cache so the join chain doesn't re-execute
      // per consumer (O(order²) re-evaluated shuffles at CCNet's order 5)
      if (k < order) probs(k).cache()
    }

    // emission: each level's rows carry the NEXT level's bow for the
    // gram they spell (absent → 0; the top level never backs off)
    val unigrams = p1
      .select(col("w"), log10(col("pd")).as("lp1"))
      .unionByName(Seq(("<s>", -99.0)).toDF("w", "lp1"))
      .unionByName(Seq(("<unk>", math.log10(d1 * cTypes * u / t))).toDF("w", "lp1"))
      .join(bowOf(2).withColumnRenamed("ctx", "w"), Seq("w"), "left")
      .select(lit(1).as("order"), lit("").as("context"), col("w").as("word"),
        col("lp1").as("log10p"), coalesce(col("bow"), lit(0.0)).as("backoff"))
    val levels = (2 to order).map { k =>
      val base = probs(k).select(col("ctx"), col("w"), log10(col("pd")).as("lp"))
      val withBow =
        if (k == order) base.withColumn("bow", lit(0.0))
        else base.join(
          bowOf(k + 1).select(col("ctx").as("__bctx"), col("bow")),
          concat_ws(" ", col("ctx"), col("w")) === col("__bctx"), "left")
      withBow.select(lit(k).as("order"), col("ctx").as("context"), col("w").as("word"),
        col("lp").as("log10p"), coalesce(col("bow"), lit(0.0)).as("backoff"))
    }

    // the model is type-table-bounded: checkpoint it eagerly so the
    // count caches can be released with zero residue
    val model = levels.foldLeft(unigrams)(_ unionByName _).localCheckpoint(true)
    (2 to order).foreach(k => tables(k).unpersist())
    (2 until order).foreach(k => probs(k).unpersist())
    t1.unpersist()
    model
  }

  /** Render a parsed-shape model back to ARPA lines — [[parse]]'s exact
    * inverse (ArpaLmProps pins parse ∘ format = id), completing KenLM
    * interop in the export direction. The model table is vocabulary-
    * bounded by construction (the same bound every trainer in this
    * package relies on), so the driver-side collect is model-sized, not
    * corpus-sized; rows are emitted in (order, context, word) order so
    * the rendering is deterministic. Backoff weights equal to 0.0 are
    * written explicitly only when non-zero — the format's own
    * convention (`parse` restores the 0.0).
    */
  def format(model: DataFrame): Seq[String] = {
    val rows = model.select(col("order").cast("int"), col("context"), col("word"),
        col("log10p"), col("backoff"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(r => (r._1, r._2, r._3))
    // the format's domain: words are non-empty and free of its three
    // structural separators — anything else would render a line that
    // reparses differently (the inverse contract would silently break)
    rows.foreach { case (_, c, w, _, _) =>
      require(w.nonEmpty && !w.exists("\t\n ".contains(_)) && !c.exists("\t\n".contains(_))
          && (c.isEmpty || c.split(" ", -1).forall(_.nonEmpty)),
        s"arpa format: word/context not representable in ARPA text: context='$c' word='$w'")
    }
    val byOrder = rows.groupBy(_._1)
    val orders = byOrder.keys.toSeq.sorted
    def fmt(d: Double): String =
      if (d == Double.PositiveInfinity) "inf"
      else if (d == Double.NegativeInfinity) "-inf"
      else BigDecimal(d).bigDecimal.stripTrailingZeros.toPlainString
    val header = Seq("\\data\\") ++ orders.map(o => s"ngram $o=${byOrder(o).length}") ++ Seq("")
    val sections = orders.flatMap { o =>
      Seq(s"\\$o-grams:") ++ byOrder(o).map { case (_, c, w, lp, bo) =>
        val gram = if (c.isEmpty) w else s"$c $w"
        if (bo == 0.0) s"${fmt(lp)}\t$gram" else s"${fmt(lp)}\t$gram\t${fmt(bo)}"
      } ++ Seq("")
    }
    header ++ sections ++ Seq("\\end\\")
  }

  /** Score documents under a parsed ARPA model ([[parse]]'s shape) with
    * the Katz back-off recursion at the model's `order`. Returns
    * (idCol, n_scored, log10p_sum, ppl): `n_scored` counts every real
    * token plus the `</s>` position, `log10p_sum` is the summed log10
    * probability, `ppl` the per-position perplexity 10^(−sum/n).
    * An empty document scores two positions — whitespace tokenization
    * yields one empty token (the tokenizer family's documented empty-doc
    * convention), which scores as OOV, plus `</s>`.
    */
  def score(
      docs: DataFrame,
      model: DataFrame,
      order: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      unkLog10p: Double = -99.0): DataFrame = {
    require(order >= 1, s"order must be >= 1, got $order")
    val m = model.select(col("order"), col("context"), col("word"), col("log10p"), col("backoff"),
      trim(concat_ws(" ", col("context"), col("word"))).as("ngram"))
    // OOV words score as <unk> when the model has one (KenLM always does)
    val unkLp = m.filter(col("order") === 1 && col("word") === "<unk>")
      .select("log10p").collect().headOption.map(_.getDouble(0)).getOrElse(unkLog10p)

    val seq = concat(array(lit("<s>")), TextAnalysis.tokens(col(textCol)), array(lit("</s>")))
    // position i (1-based over seq, starting at 2): word = seq[i],
    // ctx_k = the up-to-k words before it, space-joined
    val pos = transform(sequence(lit(2), size(col("__seq"))), i => {
      val ctxFields = (1 until order).map { k =>
        val start = greatest(i - k, lit(1))
        concat_ws(" ", slice(col("__seq"), start, i - start)).as(s"ctx$k")
      }
      struct(Seq((i - 1).as("pos"), element_at(col("__seq"), i).as("word")) ++ ctxFields: _*)
    })
    var scored = docs
      .select(col(idCol), seq.as("__seq"))
      .select(col(idCol), explode(pos).as("p"))
      .select(col(idCol) +: col("p.pos").as("pos") +: col("p.word").as("word") +:
        (1 until order).map(k => col(s"p.ctx$k")): _*)
    // level-L probability joins (context, word) and context-backoff joins
    for (l <- order to 2 by -1) {
      scored = scored
        .join(m.filter(col("order") === l)
            .select(col("context").as(s"__c$l"), col("word").as(s"__w$l"),
              col("log10p").as(s"lp$l")),
          scored(s"ctx${l - 1}") === col(s"__c$l") && scored("word") === col(s"__w$l"),
          "left")
        .drop(s"__c$l", s"__w$l")
      scored = scored
        .join(m.filter(col("order") === l - 1)
            .select(col("ngram").as(s"__n${l - 1}"), col("backoff").as(s"bow${l - 1}")),
          scored(s"ctx${l - 1}") === col(s"__n${l - 1}"), "left")
        .drop(s"__n${l - 1}")
    }
    scored = scored.join(
      m.filter(col("order") === 1).select(col("word"), col("log10p").as("lp1")),
      Seq("word"), "left")
    // the Katz cascade, log10-additive: longest match wins, each missed
    // level adds its context's backoff weight (absent context → 0)
    var s: Column = coalesce(col("lp1"), lit(unkLp))
    for (l <- 2 to order)
      s = coalesce(col(s"lp$l"), coalesce(col(s"bow${l - 1}"), lit(0.0)) + s)
    scored
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_scored"), sum(s).as("log10p_sum"))
      .select(col(idCol), col("n_scored"),
        col("log10p_sum"),
        pow(lit(10.0), -col("log10p_sum") / col("n_scored")).as("ppl"))
  }
}
