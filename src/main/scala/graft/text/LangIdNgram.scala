package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-n-gram rank-profile language identification (Cavnar &
  * Trenkle 1994, "N-Gram-Based Text Categorization"): each language gets
  * a PROFILE — its top-`profileSize` character trigrams ranked by
  * frequency over a labeled training slice — and a document is classified
  * to the language whose profile is closest under the OUT-OF-PLACE
  * distance (sum over the document's own top-ranked trigrams of the rank
  * difference to the language profile, with a fixed `profileSize` penalty
  * for trigrams absent from the profile).
  *
  * This is the model-free classifier that handles the cases the stopword
  * heuristic ([[TextAnalysis.langId]]) cannot: SHORT text (a three-word
  * string rarely contains a stopword), morphology-heavy languages where
  * character patterns (sch/ção/öß) identify the language even when no
  * function word appears, and diacritic-bearing fragments. Profiles are
  * data-derived but tiny (languages × profileSize rows), so they
  * BROADCAST; the corpus is never shuffled against itself.
  *
  * Everything is integer arithmetic over deterministic orderings
  * (count DESC, gram ASC), so the result is exactly reproducible by any
  * engine — the catalog oracle replays profile build, rank windows, and
  * the out-of-place sum verbatim in SQL.
  *
  * Scale shape: profile build = one explode + partial-agg count + one
  * per-language window over ≤ distinct-gram rows (bounded by training
  * slice size, which is curated and small by design — NOT the corpus).
  * Classification = one explode + per-document count/rank (partial-agg +
  * a window partitioned by doc — each group ≤ the doc's distinct grams),
  * then a broadcast join against the profile table and one bounded
  * aggregation: rows ≈ docs × profileSize × languages at worst, linear
  * in the corpus.
  */
object LangIdNgram {

  /** Lowercased, whitespace-collapsed, space-padded classification form —
    * the Cavnar–Trenkle normalization (padding lets trigrams see word
    * boundaries). Identical in Spark and DuckDB (`' ' ||
    * regexp_replace(lower(trim(t)), '\s+', ' ', 'g') || ' '`).
    */
  def normalized(text: Column): Column =
    concat(lit(" "), regexp_replace(lower(trim(text)), "\\s+", " "), lit(" "))

  /** All character trigrams of the normalized text, in order (one per
    * start offset). Empty/too-short text yields an empty array — NOT a
    * descending `sequence(1, 0)` (Spark's sequence runs backwards when
    * stop < start, so the guard is load-bearing).
    *
    * IMPORTANT: `text` must be a MATERIALIZED column (a plain column
    * reference), not an expression tree — the lambda inlines its input
    * into every element's substr, so handing `normalized(raw)` here
    * re-runs the regexp normalization once per character (O(len²) per
    * document; measured 10× on the catalog row). [[gramsOf]] is the safe
    * composition.
    */
  def charTrigrams(text: Column): Column =
    when(length(text) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(text) - 2), i => text.substr(i, lit(3))))


  /** Per-language rank profiles from a LABELED training slice:
    * (lang, gram, lrank) with lrank 1..`profileSize` by
    * (count DESC, gram ASC). The labeled slice is the curated training
    * set of the published method — pass a small high-confidence sample,
    * not the raw corpus.
    */
  def profiles(
      labeled: DataFrame,
      profileSize: Int = 100,
      textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    require(profileSize > 0, s"profileSize must be positive, got $profileSize")
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("gram"))
    labeled
      // normalize in its own projection: the transform lambda must see a
      // materialized column, or the regexp chain re-runs per character
      .select(col(langCol).cast("string").as("lang"),
        normalized(col(textCol)).as("__n"))
      .select(col("lang"), explode(charTrigrams(col("__n"))).as("gram"))
      .groupBy("lang", "gram").agg(count(lit(1)).as("cnt"))
      .withColumn("lrank", row_number().over(w))
      .filter(col("lrank") <= profileSize)
      .select(col("lang"), col("gram"), col("lrank").cast("long").as("lrank"))
  }

  /** Classify documents against `profileDf` ([[profiles]] output):
    * (id, pred_lang, dist) — pred_lang the out-of-place-distance argmin
    * (ties to the alphabetically first language), dist the winning
    * integer distance. Documents whose normalized text is shorter than
    * one trigram produce no row (no evidence — callers route them to
    * their own policy rather than receiving an arbitrary label).
    */
  def classify(
      docs: DataFrame,
      profileDf: DataFrame,
      profileSize: Int = 100,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxChars: Int = Int.MaxValue): DataFrame = {
    require(profileSize > 0, s"profileSize must be positive, got $profileSize")
    require(maxChars >= 3, s"maxChars must be >= 3 (one trigram), got $maxChars")
    // maxChars: classify on a normalized-text PREFIX — Cavnar–Trenkle
    // itself classifies ~300-byte samples, and the prefix bounds the
    // per-doc gram fan-out (the corpus-scale cost lever: full-text vs
    // 300-char classification is ~20× gram rows at web-document lengths,
    // for a decision short samples already make)
    val normed =
      if (maxChars == Int.MaxValue) normalized(col(textCol))
      else substring(normalized(col(textCol)), 1, maxChars)
    // the document profile is computed by ONE fused kernel pass
    // ([[graft.functions.TopGramRanks]]): the declarative equivalent —
    // explode all trigrams, count per (doc, gram), per-doc rank window —
    // shuffles a corpus-sized gram stream (≈ chars per doc) and sorts it
    // per doc; the kernel ships ≤ profileSize rows per document into the
    // plan instead (2.4× on the 1M-doc BenchScale section, 1.7× on the
    // catalog row — the remaining cost is the ×languages scoring join)
    val docGrams = docs
      .select(col(idCol).as("__id"), normed.as("__n"))
      .select(col("__id"),
        posexplode(graft.internal.SqlBridge.column(
          graft.functions.TopGramRanks(
            graft.internal.SqlBridge.expression(col("__n")), profileSize)))
          .as(Seq("__p", "gram")))
      .select(col("__id"), col("gram"), (col("__p") + 1).cast("long").as("drank"))
    val langs = profileDf.select("lang").distinct()
    val pick = Window.partitionBy("__id").orderBy(col("dist"), col("lang"))
    docGrams
      .join(broadcast(langs))
      .join(broadcast(profileDf), Seq("lang", "gram"), "left")
      .groupBy("__id", "lang")
      .agg(sum(coalesce(abs(col("drank") - col("lrank")),
        lit(profileSize.toLong))).as("dist"))
      .withColumn("__r", row_number().over(pick))
      .filter(col("__r") === 1)
      .select(col("__id").as(idCol), col("lang").as("pred_lang"), col("dist"))
  }
}
