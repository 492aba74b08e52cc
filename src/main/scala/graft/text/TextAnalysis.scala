package graft.text

import graft.internal.SqlBridge
import graft.functions.SimHash64
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (brief: language-ID,
  * quality scoring, token counting, fingerprinting). All built from
  * codegen'd built-ins so they run inside WholeStageCodegen at scan speed.
  */
object TextAnalysis {

  /** Language stopword tables (shared with the DuckDB oracle SQL — keep in
    * sync with [[langIdOracleCase]]).
    */
  val StopWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "que", "y", "en", "un", "los", "se"),
    "fr" -> Seq("le", "la", "et", "un", "que", "pour", "dans", "ce"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "不"),
  )

  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** BPE-style pretokenizer pattern (GPT-2 family): contraction suffixes,
    * space-prefixed letter runs, digit runs, punctuation runs, residual
    * whitespace. Restricted to RE2-compatible syntax (no lookahead, and an
    * EXPLICIT whitespace class — Java's \s includes \x0B, RE2's does not)
    * so the DuckDB oracle evaluates the IDENTICAL pattern — token counts
    * from this approximate real LLM-tokenizer counts far better than
    * whitespace splitting (CJK text: one run per script block, not one per
    * line).
    */
  val BpeTokenPattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\t\\n\\f\\r \\p{L}\\p{N}]+|[\\t\\n\\f\\r ]+"

  /** Number of BPE-style pretokens in `text`. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0))).cast("long")

  /** Number of REAL BPE tokens in `text`: the published merge loop over a
    * standard merges.txt table ([[Bpe]]), one kernel pass. Defaults to the
    * in-repo [[Bpe.DemoMerges]]; pass a full GPT-2 merges file's lines for
    * GPT-2 counts. Unlike [[bpeTokenCount]] (pretokens only), this counts
    * post-merge subword units — the LLM-pipeline budget metric.
    */
  def bpeTokenCountReal(text: Column, mergeLines: Seq[String] = Bpe.DemoMerges): Column =
    SqlBridge.column(graft.functions.BpeTokenCount(SqlBridge.expression(text), mergeLines))

  /** The full BPE token piece array (GPT-2 space→Ġ convention) under the
    * same merges table — `size` of it equals [[bpeTokenCountReal]] by
    * construction, and mapping Ġ→space over a join of the pieces
    * reconstructs the text exactly. */
  def bpeTokensReal(text: Column, mergeLines: Seq[String] = Bpe.DemoMerges): Column =
    SqlBridge.column(graft.functions.BpeTokens(SqlBridge.expression(text), mergeLines))

  /** BYTE-LEVEL BPE token count — the production GPT-2/tiktoken
    * convention: the published split regex ([[Bpe.Gpt2SplitPattern]],
    * Unicode `\s`), UTF-8 bytes spelled through [[Bpe.ByteEncoder]]
    * (one initial symbol per BYTE), then the merge loop. With a real
    * merges.txt the counts are byte-identical to the published
    * tokenizer; differs from [[bpeTokenCountReal]] exactly where
    * codepoint pretokenization diverges from byte fallback (non-ASCII).
    */
  def bpeTokenCountBytes(text: Column, mergeLines: Seq[String] = Bpe.DemoMerges): Column =
    SqlBridge.column(graft.functions.BpeTokenCount(
      SqlBridge.expression(text), mergeLines, byteLevel = true))

  /** The byte-level piece array under the same table — `size` equals
    * [[bpeTokenCountBytes]]; decoding each piece char through
    * [[Bpe.ByteDecoder]] and re-assembling reconstructs the text's
    * UTF-8 bytes exactly.
    */
  def bpeTokensBytes(text: Column, mergeLines: Seq[String] = Bpe.DemoMerges): Column =
    SqlBridge.column(graft.functions.BpeTokens(
      SqlBridge.expression(text), mergeLines, byteLevel = true))

  /** Count of tokens present in `words`. */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  /** All per-language counts in one tokenize pass (kernel). */
  def langCountsArray(text: Column): Column =
    SqlBridge.column(graft.functions.StopwordCounts(
      SqlBridge.expression(text), StopWords.map(_._2)))

  /** Per-language stopword counts, columns named cnt_<lang>. */
  def langCounts(text: Column): Seq[(String, Column)] = {
    val arr = langCountsArray(text)
    StopWords.zipWithIndex.map { case ((lang, _), i) => lang -> element_at(arr, i + 1) }
  }

  /** Heuristic language id: the first language (in [[StopWords]] order)
    * whose stopword count is maximal; "und" (undetermined) when all zero.
    */
  def langId(text: Column): Column = {
    val counts = langCounts(text)
    val maxCnt = greatest(counts.map(_._2): _*)
    val chain = counts.foldLeft(when(maxCnt === 0, lit("und"))) { case (acc, (lang, cnt)) =>
      acc.when(cnt === maxCnt, lit(lang))
    }
    chain.otherwise(lit("und"))
  }

  /** DuckDB CASE expression mirroring [[langId]] exactly. */
  def langIdOracleSql(textExpr: String): String = {
    def cnt(words: Seq[String]) =
      s"len(list_filter(regexp_split_to_array(trim(lower($textExpr)), '\\s+'), t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
    val counts = StopWords.map { case (lang, words) => lang -> cnt(words) }
    val maxExpr = s"greatest(${counts.map(_._2).mkString(", ")})"
    val whens = counts.map { case (lang, c) => s"WHEN $c = __mx THEN '$lang'" }.mkString(" ")
    s"(SELECT CASE WHEN __mx = 0 THEN 'und' $whens ELSE 'und' END FROM (SELECT $maxExpr AS __mx) __m)"
  }

  /** Quality-score components: token count, char count, punctuation ratio,
    * stopword ratio, mean token length (brief: "length/punct/stopword
    * ratios").
    */
  def qualityScore(text: Column): Column = {
    val nTok = size(tokens(text)).cast("double")
    val stopRatio = element_at(langCountsArray(text), 1).cast("double") / nTok
    val lengthScore = least(nTok / lit(100.0), lit(1.0))
    round(lengthScore * 0.5 + stopRatio * 0.5, 4)
  }

  /** Gopher/C4-style repetition signal: the fraction of token n-grams that
    * repeat an earlier n-gram of the same document, 1 − distinct/total
    * (0 = no repetition, →1 = the document is one phrase looped). Docs
    * shorter than n tokens count as one degenerate shingle — ratio 0.
    * Boilerplate and template spam score high here long before they share
    * enough text to pair in LSH, which makes this the cheap FIRST filter
    * of a curation cascade (single narrow pass, no shuffle, no join).
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    // distinct n-gram count via the fused single-pass kernel
    // (ShingleHashSet — the HOF formulation re-evaluates the regex split
    // per gram element, O(L²) per doc: measured 20× slower at sf0.1);
    // docs under n tokens are one degenerate shingle — ratio 0 directly
    val nToks = size(tokens(text))
    val distinctN = size(SqlBridge.column(
      graft.functions.ShingleHashSet(SqlBridge.expression(text), n)))
    when(nToks < n, lit(0.0))
      .otherwise(lit(1.0) - distinctN.cast("double") / (nToks - (n - 1)).cast("double"))
  }

  /** C4 line-keep rule (Raffel et al. 2020 §2.2): a line survives iff it
    * ends in terminal punctuation, has at least 3 words, and does not
    * mention "javascript". Expressed in engine-portable primitives (trim +
    * anchored regex + whitespace split) so the DuckDB oracle replays the
    * identical predicate.
    */
  def c4LineKeep(line: Column): Column =
    regexp_like(trim(line), lit("[.!?\"]$")) &&
      size(split(trim(line), "\\s+")) >= 3 &&
      !contains(lower(line), lit("javascript"))

  /** C4 page-drop rule: any "lorem ipsum" (placeholder text) or "{" (code
    * leaking into prose) discards the whole document.
    */
  def c4PageFlag(text: Column): Column =
    contains(lower(text), lit("lorem ipsum")) || contains(text, lit("{"))

  /** Unicode NFC canonical normalization ([[graft.functions.NfcNormalize]]
    * kernel — UAX #15 canonical composition, the conservative standard; a
    * decomposed e + combining acute and the precomposed é are the same
    * text to a reader but different bytes to every digest, shingle, and
    * pretoken in this engine). Already-normalized input (all ASCII)
    * passes through allocation-free.
    */
  def nfc(text: Column): Column =
    SqlBridge.column(graft.functions.NfcNormalize(SqlBridge.expression(text)))

  /** The standard pre-tokenizer text normalization pass, each step a
    * codegen regexp over the NFC'd text (one narrow projection, no
    * shuffle, replayable verbatim by any RE2-compatible engine): NFC →
    * CRLF/CR to LF → strip C0 controls except tab/newline (plus DEL) →
    * collapse horizontal-whitespace runs to one space → SQL trim. Runs
    * BEFORE anything byte-sensitive — dedup digests, shingles, BPE
    * pretokens — so visually-identical documents hash identically.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(nfc(text), "\\r\\n|\\r", "\n"),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "[ \\t]+", " "))

  /** RE2-safe case-insensitive word-boundary alternation over a blocklist
    * — the C4 badword-page-filter shape (Raffel et al. 2020 §2.2 drop any
    * page containing a word from a published blocklist). Words must be
    * ASCII letters/digits with INTERIOR hyphens only: ASCII because
    * Java's `(?i)` folds ASCII case only while RE2's folds Unicode — a
    * non-ASCII word would silently diverge between the engine and a
    * replaying oracle; interior hyphens because `\b` is the ASCII
    * word-class boundary, so an edge hyphen would demand a word char
    * beyond it and the word could never match. No regex metacharacter can
    * smuggle in; sorted so the pattern — and every count derived from it —
    * is independent of caller list order.
    */
  def blocklistPattern(words: Seq[String]): String =
    "(?i)\\b(" + blocklistValidated(words).mkString("|") + ")\\b"

  /** Shared validation + canonical ordering for the regex and
    * Aho–Corasick blocklist forms: every entry ASCII letters/digits with
    * INTERIOR hyphens/spaces only (spaces admit C4-style multi-word
    * phrases; both are regex-literal and RE2-safe), distinct, sorted —
    * so the alternation order, and with it every same-start tie-break,
    * is a pure function of the entry SET in both engines.
    */
  private[graft] def blocklistValidated(words: Seq[String]): Seq[String] = {
    require(words.nonEmpty, "blocklist must be non-empty")
    words.foreach { w =>
      require(w.nonEmpty &&
          w.forall(c => c < 128 && (c.isLetterOrDigit || c == '-' || c == ' ')),
        s"blocklist entry '$w' must be ASCII letters/digits/hyphens/spaces only " +
          "(Java (?i) folds ASCII case only; RE2 folds Unicode — a non-ASCII " +
          "entry would diverge between engines)")
      require(!"- ".exists(c => w.head == c || w.last == c),
        s"blocklist entry '$w' has an edge hyphen/space — \\b would demand a " +
          "word char beyond it and the entry could never match")
    }
    words.distinct.sorted
  }

  /** Number of blocklist hits in `text` — one codegen regexp pass; the
    * standard page gate is `blocklistHits(...) === 0`. The pattern is
    * built once driver-side (blocklists are a few thousand words — a
    * compiled-regex literal, not a join).
    */
  def blocklistHits(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(text, lit(blocklistPattern(words)), lit(0))).cast("long")

  /** [[blocklistHits]]'s SCALE form: the same counts via an interned
    * Aho–Corasick automaton ([[graft.functions.BlocklistAhoKernel]]) —
    * one O(text) pass per document REGARDLESS of list size, where the
    * alternation regex degrades with its compiled NFA at real blocklist
    * sizes (10k–100k entries). Use the regex form for a handful of words
    * (oracle-replayable in plain SQL), this one for production lists.
    *
    * One documented divergence at non-ASCII ADJACENCY: the kernel's `\b`
    * is ASCII/RE2-style (`[A-Za-z0-9_]` word chars), while
    * [[blocklistHits]] runs Java regex whose `\b` is Unicode-aware — an
    * entry abutting a non-ASCII LETTER ("spamé", "坏spam") counts as a
    * hit here but not in the regex form. On ASCII-delimited text the two
    * are identical (BlocklistAhoSpec pins both halves); on multilingual
    * corpora prefer ONE form consistently.
    */
  def blocklistHitsAho(text: Column, words: Seq[String]): Column =
    SqlBridge.column(graft.functions.BlocklistHitsAho(SqlBridge.expression(text), words))

  /** C4 boilerplate cleaning as ONE narrow codegen pass (split → HOF
    * filter → rejoin — no shuffle, no UDF): returns `struct(clean_text,
    * n_kept, n_dropped, page_dropped)`. A flagged page keeps nothing
    * (clean_text = '', every line counted dropped), mirroring C4's
    * page-level discard; callers filter on `page_dropped` and write
    * `clean_text`. Line scrubbing composes BEFORE the cross-document
    * passes ([[graft.dedup.Dedup.removeDuplicateLines]], MinHash): C4's
    * in-document heuristics need no corpus state, so they belong in the
    * scan projection where they cost one pass at any corpus size.
    */
  def c4CleanLines(text: Column): Column = {
    val lines = split(text, "\n")
    val kept = filter(lines, c4LineKeep _)
    val flagged = c4PageFlag(text)
    struct(
      when(flagged, lit("")).otherwise(array_join(kept, "\n")).as("clean_text"),
      when(flagged, lit(0)).otherwise(size(kept)).cast("long").as("n_kept"),
      when(flagged, size(lines)).otherwise(size(lines) - size(kept))
        .cast("long").as("n_dropped"),
      flagged.cast("long").as("page_dropped"))
  }

  /** C4-style character-class ratios over the raw text (ASCII classes so
    * every engine computes the same value): uppercase, digit, alphabetic.
    * Empty text ratios are 0.0, not null — Spark's x/0 is null while
    * DuckDB's raises, so the unguarded division would silently diverge
    * (and pass null through downstream filters) on the first empty doc.
    */
  def charClassRatios(text: Column): Seq[(String, Column)] = {
    val len = length(text).cast("double")
    def ratio(cls: String) =
      when(len === 0d, lit(0.0))
        .otherwise(length(regexp_replace(text, cls, "")).cast("double") / len)
    Seq(
      "upper_ratio" -> ratio("[^A-Z]"),
      "digit_ratio" -> ratio("[^0-9]"),
      "alpha_ratio" -> ratio("[^A-Za-z]"))
  }

  /** Remaining cheap Gopher signals over the raw text, all in the same
    * narrow shuffle-free projection as [[repetitionRatio]] /
    * [[charClassRatios]]: mean token length (machine-generated text skews
    * short or long), symbol-to-word ratio ('#' and '...' occurrences per
    * token — markup and truncation residue), and the fraction of lines
    * that are bullets / end in an ellipsis (template and truncated-scrape
    * spam). Lambdas reference only their own variable, so nothing is
    * re-evaluated per element. Degenerate inputs: splitting empty text
    * yields one empty token and one empty line, so no denominator is 0.
    */
  def gopherSignals(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val meanWordLen = aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") / nTok
    val hashes = length(text) - length(translate(text, "#", ""))
    val ellipses = (length(text) - length(call_function("replace", text, lit("..."), lit("")))) / lit(3)
    val lines = split(text, "\n", -1)
    val nLines = size(lines).cast("double")
    def lineFrac(pred: Column => Column) =
      size(filter(lines, pred)).cast("double") / nLines
    Seq(
      "mean_word_len" -> meanWordLen,
      "symbol_word_ratio" -> (hashes + ellipses).cast("double") / nTok,
      "bullet_line_frac" -> lineFrac(l =>
        ltrim(l).startsWith("- ") || ltrim(l).startsWith("* ") || ltrim(l).startsWith("• ")),
      "ellipsis_line_frac" -> lineFrac(l => rtrim(l).endsWith("...")))
  }

  /** All eight quality-filter signals ([[repetitionRatio]] +
    * [[charClassRatios]] + [[gopherSignals]]) as ONE struct column from a
    * single fused kernel pass ([[graft.functions.QualitySignals]]): one
    * tokenize, one character scan, one line scan per document instead of
    * ~7 composable passes. Field-for-field double-identical to the
    * composable columns. Production filter cascades should consume this;
    * the composable forms stay as the documented reference semantics.
    */
  def qualitySignals(text: Column): Column =
    SqlBridge.column(graft.functions.QualitySignals(SqlBridge.expression(text)))

  /** All 13 Gopher repetition-removal signals (Rae et al. 2021 Table A1 —
    * duplicate line/paragraph fractions by count and by characters, top
    * {2,3,4}-gram character share, duplicated {5..10}-gram character
    * coverage) as ONE struct column from a single fused kernel pass
    * ([[graft.functions.RepetitionSignals]]). These are the published
    * thresholds' exact inputs; `qualitySignals.rep3_ratio` is the cheap
    * cousin this completes.
    */
  def repetitionSignals(text: Column): Column =
    SqlBridge.column(graft.functions.RepetitionSignals(SqlBridge.expression(text)))

  /** 60-bit SimHash over md5-derived token hashes. Engine-reproducible:
    * token hash = first 15 hex chars of md5 as a long, so DuckDB can mirror
    * it (`CAST(concat('0x', substr(md5(t),1,15)) AS BIGINT)`). Single-kernel
    * pass ([[graft.functions.SimHashText]]); [[simhashFromHashes]] exposes
    * the compositional form over precomputed hash arrays.
    */
  def simhash(text: Column, nbits: Int = 60): Column =
    SqlBridge.column(graft.functions.SimHashText(SqlBridge.expression(text), nbits))

  /** SimHash over an explicit `array<long>` of token hashes. */
  def simhashFromHashes(hashes: Column, nbits: Int = 60): Column =
    SqlBridge.column(SimHash64(SqlBridge.expression(hashes), nbits))

  /** Hamming distance between two simhash longs. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Token document frequencies: one row per distinct token with the number
    * of documents containing it (shuffle on token; partial counts map-side).
    */
  def tokenDocumentFrequency(docs: org.apache.spark.sql.DataFrame, textCol: String = "text"): org.apache.spark.sql.DataFrame =
    docs.select(explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"))

  /** Per-document mean IDF (token rarity) — a cheap perplexity proxy for
    * quality filtering: rare-token-heavy docs score high. Two shuffles:
    * the df table build and the token→df join.
    */
  def docRarity(docs: org.apache.spark.sql.DataFrame, idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val n = docs.count()
    val df = tokenDocumentFrequency(docs, textCol)
    docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .join(df, Seq("token"))
      .groupBy(idCol)
      .agg(avg(log(lit(n.toDouble) / col("df"))).as("rarity"))
  }

  /** CCNet-style language-model quality signal (Wenzek et al. 2020 score
    * documents by LM perplexity; the in-sandbox model is the corpus's own
    * unigram LM — same pipeline shape, pluggable model): per-document
    * cross-entropy −mean ln p(token), where p(token) = corpus running-text
    * frequency. Low = templated/common text, high = rare-token soup; both
    * tails are what CCNet's filtering buckets cut. Distinct from
    * [[docRarity]]'s IDF (documents CONTAINING a token vs occurrences in
    * running text — burstiness moves the two apart).
    *
    * Returns (id, n_tokens, cross_entropy). Scale shape: the unigram
    * count table is vocab-sized (Heaps' law: ~millions of rows at corpus
    * scale, not corpus-sized), so it BROADCASTS to the scoring join; the
    * corpus streams once through token explode + map-side-combined count
    * build, once through the scoring pass. The count table is cached: it
    * feeds the total-token action and the broadcast.
    */
  def lmCrossEntropy(docs: org.apache.spark.sql.DataFrame, idCol: String = "doc_id", textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val counts = docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("c"))
      .cache()
    val total = counts.agg(sum(col("c"))).head().getLong(0).toDouble
    docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .join(broadcast(counts), Seq("token"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        (-avg(log(col("c").cast("double") / lit(total)))).as("cross_entropy"))
  }

  /** Bigram cross-entropy with STUPID BACKOFF (Brants et al. 2007, "Large
    * Language Models in Machine Translation") — the CCNet-style quality
    * score one order up from [[lmCrossEntropy]]'s unigram: score every
    * corpus document under an LM trained on a (typically curated) `train`
    * set, where a bigram seen in training scores its conditional MLE and
    * an unseen one backs off to α times the add-1-smoothed unigram:
    *
    *   S(w | w₋₁) = c₂(w₋₁ w) / c₁(w₋₁)        if c₂ > 0
    *              = α · (c₁(w) + 1) / (T + V)   otherwise
    *
    * with T the trained token count, V the trained vocabulary size (the
    * +1/+V add-1 keeps out-of-vocabulary tokens finite), α = 0.4 (the
    * published constant). Returns (id, n_bigrams, cross_entropy) with
    * cross_entropy = −mean ln S over the doc's bigram positions; docs
    * with fewer than two tokens have no bigram positions and drop out.
    *
    * Scale shape — why this is NOT [[lmCrossEntropy]] with a longer key:
    * the unigram table is vocab-sized and broadcasts, but the bigram
    * table grows toward vocab² and must NOT ride a broadcast; it joins
    * the corpus's bigram positions on the (w₋₁, w) key — one
    * hash-partitioned shuffle each side, partial-agg counted on the
    * train side. Bigram positions are assembled NARROWLY per document
    * (zip of the token array with its tail), so no window pass and no
    * doc-keyed shuffle before the final per-doc aggregation.
    */
  def lmCrossEntropyBigram(
      corpus: org.apache.spark.sql.DataFrame,
      train: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      alpha: Double = 0.4): org.apache.spark.sql.DataFrame = {
    def bigrams(df: org.apache.spark.sql.DataFrame, keep: Seq[String]): org.apache.spark.sql.DataFrame = {
      val n = greatest(size(col("__toks")) - 1, lit(0))
      df.select(keep.map(col) :+ tokens(col(textCol)).as("__toks"): _*)
        .select(keep.map(col) :+ explode(zip_with(
          slice(col("__toks"), lit(1), n), slice(col("__toks"), lit(2), n),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"): _*)
        .select(keep.map(col) :+ col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)
    }
    val c2 = bigrams(train, Seq.empty).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = train.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c1"))
      .cache()
    val tot = c1.agg(sum("c1"), count(lit(1))).head()
    val (t, v) = (tot.getLong(0).toDouble, tot.getLong(1).toDouble)
    val scored = bigrams(corpus, Seq(idCol))
      .join(c2, Seq("w1", "w2"), "left")
      .join(broadcast(c1.withColumnRenamed("token", "w1").withColumnRenamed("c1", "c1_prev")),
        Seq("w1"), "left")
      .join(broadcast(c1.withColumnRenamed("token", "w2").withColumnRenamed("c1", "c1_cur")),
        Seq("w2"), "left")
    // c2 ≥ 1 implies c1_prev ≥ 1 (every trained bigram's w₋₁ is a trained
    // token), so the MLE branch never divides by null/zero
    val s = when(col("c2").isNotNull,
        col("c2").cast("double") / col("c1_prev"))
      .otherwise(lit(alpha) * (coalesce(col("c1_cur"), lit(0L)) + 1).cast("double") / lit(t + v))
    scored
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), (-avg(log(s))).as("cross_entropy"))
  }

  /** CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020,
    * §4.3): per language, split the corpus at the empirical terciles of
    * the LM score — `head` is the most-fluent third (lowest
    * cross-entropy), `tail` the least; CCNet-derived corpora train on
    * head(+middle) and drop tail. The score is [[lmCrossEntropy]]
    * (pluggable in spirit — CCNet uses an external KenLM; the sandbox
    * model is the corpus's own unigram LM).
    *
    * Cutoffs are computed on the ROUNDED (4-decimal) score: the rounded
    * value is reproducible across engines bit-for-bit (ulp-level ln
    * differences are absorbed), so the tercile order statistics — and
    * hence the bucket of a document sitting exactly AT a cutoff — are
    * deterministic. When an interpolated cutoff could tie a document's
    * score, the quantile position lands on a sample and the cutoff IS
    * that sample, exactly, in any engine with linear-interpolation
    * quantiles.
    *
    * Scale shape: [[lmCrossEntropy]]'s passes, plus one per-language
    * `percentile` aggregate whose RESULT is 2 doubles per language but
    * whose aggregation STATE is a value→count map of the distinct rounded
    * scores per language — bounded by the 4-decimal rounding (≤ ~10^4 ·
    * score-range entries per language), not O(1); the bounded-cardinality
    * rounding is what makes the exact aggregate affordable. The tiny
    * cutoff table BROADCASTS back for a single comparison pass —
    * deliberately NOT a per-language ntile window, which would global-sort
    * the largest language's entire corpus slice on one partition chain at
    * 100 TB.
    *
    * Returns (id, byCol, cross_entropy ROUNDED to 4, bucket).
    */
  def ccnetBuckets(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      byCol: String = "lang"): org.apache.spark.sql.DataFrame = {
    val ce = lmCrossEntropy(docs, idCol, textCol)
      .select(col(idCol), round(col("cross_entropy"), 4).as("cross_entropy"))
    val scored = docs.select(col(idCol), col(byCol)).join(ce, Seq(idCol))
    val cuts = scored.groupBy(byCol)
      .agg(expr("percentile(cross_entropy, array(0.3333333333333333D, 0.6666666666666666D))")
        .as("cut"))
      .select(col(byCol), col("cut")(0).as("c1"), col("cut")(1).as("c2"))
    scored.join(broadcast(cuts), Seq(byCol))
      .select(col(idCol), col(byCol), col("cross_entropy"),
        when(col("cross_entropy") <= col("c1"), "head")
          .when(col("cross_entropy") <= col("c2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every corpus
    * document by how much more likely its tokens are under the TARGET
    * distribution (a small high-quality set) than under the corpus's own,
    * then resample the corpus proportionally. The published feature space
    * is hashed n-grams with bag-of-words probabilities; here the unigram
    * bag with add-1 smoothing over the corpus vocabulary:
    *
    *   w(doc) = mean over tokens of
    *            [ ln (ct+1)/(Nt+V)  −  ln (cs+1)/(Ns+V) ]
    *
    * with ct/cs the token's count in target/corpus, Nt/Ns the summed
    * counts, V the corpus vocabulary size. Target tokens outside the
    * corpus vocabulary contribute to nothing (no corpus token they could
    * re-weight). Positive = target-like, negative = corpus-typical.
    *
    * Scale shape: two token-keyed counting shuffles (map-side combined;
    * the target side is small by construction), one vocab-sized join of
    * the two count tables, and a scoring pass where the corpus streams
    * once against the BROADCAST count table — the same shape as
    * [[lmCrossEntropy]] with a second count column. The three totals ride
    * in the broadcast row; nothing corpus-sized leaves the executors.
    *
    * Returns (id, n_tokens, dsir_weight).
    */
  def dsirWeights(
      corpus: org.apache.spark.sql.DataFrame,
      target: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val tokC = corpus.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val cntC = tokC.groupBy("token").agg(count(lit(1)).as("cs"))
    val cntT = target.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("ct"))
    val cnt = cntC.join(cntT, Seq("token"), "left")
      .select(col("token"), col("cs"), coalesce(col("ct"), lit(0L)).as("ct"))
      .cache()
    val tot = cnt.agg(sum("cs"), sum("ct"), count(lit(1))).head()
    val (ns, nt, v) = (tot.getLong(0).toDouble, tot.getLong(1).toDouble, tot.getLong(2).toDouble)
    tokC.join(broadcast(cnt), Seq("token"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        avg(log((col("ct") + 1).cast("double") / lit(nt + v))
          - log((col("cs") + 1).cast("double") / lit(ns + v))).as("dsir_weight"))
  }

  /** PII redaction (RefinedWeb/FineWeb-style pre-training hygiene):
    * replace email addresses and phone-shaped digit runs with fixed
    * placeholder tokens, reporting per-document match counts. The
    * patterns are RE2-safe (no lookaround, no backreferences) so any
    * engine — and the DuckDB oracle — computes the identical result; a
    * single narrow projection, no shuffle, composable with the quality
    * signals in the same pass.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9() .-]{6,}[0-9]"

  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailPattern)),
    "n_phones" -> regexp_count(regexp_replace(text, EmailPattern, "<EMAIL>"),
      lit(PhonePattern)))

  /** The redacted text: emails first (an email's local part may contain
    * digits a phone pattern would half-match), then phone runs.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** URL pattern for [[links]]. Explicit whitespace class — Java's \s and
    * RE2's \s disagree on \x0B, and the DuckDB oracle must evaluate the
    * IDENTICAL pattern (same rationale as [[BpePretokenPattern]]).
    */
  val UrlPattern = "(?i)\\bhttps?://[^ \t\n\r\"'<>)]+"

  /** All http(s) URLs in a document, in order — the first half of the
    * link/domain census web-corpus curation runs for domain mixing,
    * blocklists, and link-graph features. One codegen'd
    * `regexp_extract_all` pass.
    */
  def links(text: Column): Column =
    regexp_extract_all(text, lit(UrlPattern), lit(0))

  /** Parse an HTTP RESPONSE envelope — what a WARC `response` record's
    * payload actually is (`application/http;msgtype=response`: status
    * line + headers + CRLFCRLF + entity body). Every CommonCrawl-style
    * pipeline must strip this before [[extractMarkup]] sees the HTML.
    * Returns `struct(status, content_type, body)`: `status` is the
    * 3-digit code as BIGINT (null when the status line is not HTTP),
    * `content_type` the media type with parameters dropped (null when
    * absent), `body` everything past the first blank line. A payload
    * whose envelope NEVER terminates (no blank line) yields ALL-null —
    * a torn envelope has no trusted fields, and its headers must not
    * leak downstream as "text". Lenient servers emit bare-LF header
    * termination (`\n\n`) — real crawl captures carry both forms, so the
    * EARLIEST of `\r\n\r\n` / `\n\n` terminates the block (a bare-LF
    * envelope whose body merely contains CRLFCRLF must not leak headers,
    * and vice versa). One codegen locate + substring + anchored regexp
    * chain; RE2-compatible, so a SQL oracle replays it.
    */
  def httpResponse(payloadText: Column): Column = {
    val crlf = locate("\r\n\r\n", payloadText) // 1-based; 0 = absent
    val lf = locate("\n\n", payloadText)
    // earliest terminator wins; CRLFCRLF never contains "\n\n", so a
    // tie is impossible and crlf < lf means the CRLF block ends first
    val useCrlf = crlf > 0 && (lf === 0 || crlf < lf)
    val headEnd = when(useCrlf, crlf).otherwise(lf)
    val head = when(headEnd > 0, payloadText.substr(lit(1), headEnd - 1))
    val status = regexp_extract(head, "^HTTP/[0-9.]+ ([0-9]{3})", 1)
    val ctype = regexp_extract(head, "(?im)^content-type:[ \t]*([^\r\n;]+)", 1)
    struct(
      when(status =!= "", status.cast("long")).as("status"),
      when(ctype =!= "", trim(ctype)).as("content_type"),
      when(headEnd > 0,
        payloadText.substr(headEnd + when(useCrlf, lit(4)).otherwise(lit(2)),
          length(payloadText)))
        .as("body"))
  }

  /** Charset-sniff + decode a raw body ([[graft.functions.CharsetKernel]]
    * cascade: Content-Type `charset=` param → BOM → `<meta charset>` in
    * the first 1024 bytes → UTF-8 validity → windows-1252 fallback) —
    * returns `struct(charset, charset_source, text)`. Use for WET
    * conversion records or any payload whose envelope is already
    * stripped; a null/absent `contentType` just skips the transport step.
    */
  def decodeCharset(payload: Column, contentType: Column): Column =
    SqlBridge.column(graft.functions.CharsetDecode(
      SqlBridge.expression(payload),
      SqlBridge.expression(coalesce(contentType, lit("")))))

  /** [[httpResponse]]'s CHARSET-CORRECT form: split the HTTP response
    * envelope on the raw BYTES (so a non-UTF-8 body is never cast
    * through UTF-8 first), UNWRAP wire encodings (chunked transfer
    * framing, gzip/x-gzip/deflate content codings — tolerant of the
    * truncation and header lies real crawls carry, every tolerance
    * visible in the `encoding` field; unsupported codings null the body
    * rather than leak compressed bytes as "text"), then run the charset
    * cascade on the final body bytes with the header's `charset=`
    * parameter as the transport declaration — `struct(status,
    * content_type, charset, charset_source, body, encoding)`, one kernel
    * pass ([[graft.functions.HttpDecodeKernel]]). Prefer this in real
    * ingest chains; [[httpResponse]] remains the SQL-replayable
    * UTF-8-corpus form.
    */
  def httpResponseDecoded(payload: Column): Column =
    SqlBridge.column(graft.functions.HttpDecode(SqlBridge.expression(payload)))

  /** Parse one CDX(J) crawl-index line — the metadata sidecar format the
    * big public crawls publish next to their WARC segments (pywb /
    * CommonCrawl cc-index: `<SURT key> <14-digit timestamp> <JSON>`),
    * the table a pipeline queries to SELECT archive subsets (by status,
    * mime, digest, URL) before fetching a byte of payload. Returns
    * `struct(surt_key, cdx_ts, meta struct(url, mime, status, digest,
    * length, offset, filename))` — `meta` is null when the JSON third
    * field is absent or malformed (gate on `meta.url is not null`). One
    * codegen split + `from_json`; no UDF, and DuckDB's JSON operators
    * replay the extraction.
    */
  def parseCdxj(line: Column): Column = {
    val parts = split(line, " ", 3)
    val metaSchema = org.apache.spark.sql.types.StructType(
      Seq("url", "mime", "status", "digest", "length", "offset", "filename")
        .map(org.apache.spark.sql.types.StructField(_,
          org.apache.spark.sql.types.StringType, nullable = true)))
    // get(), not getItem(): a line with no JSON third field must parse
    // to a null meta, not throw under ANSI array indexing
    struct(
      get(parts, lit(0)).as("surt_key"),
      get(parts, lit(1)).as("cdx_ts"),
      from_json(get(parts, lit(2)), metaSchema).as("meta"))
  }

  /** Parse a SITEMAP document (sitemaps.org protocol) — the discovery
    * side of the politeness surface (robots.txt names sitemaps; the
    * sitemap names the URLs a crawl frontier seeds from). Handles both
    * file kinds: a `<urlset>` of `<url>` entries and a `<sitemapindex>`
    * of `<sitemap>` entries (`is_index` distinguishes them). Per entry:
    * `loc` (whitespace-trimmed, the five predefined XML entities
    * decoded, `&amp;` last), `lastmod`, `changefreq`, `priority`
    * (double; null when absent — the protocol's own default 0.5 is the
    * CALLER's policy, not parser output).
    *
    * One codegen chain (regexp_extract_all over entry blocks, per-field
    * non-greedy extracts inside a transform) restricted to RE2-safe
    * syntax — no backreferences, no lookaround — so the DuckDB oracle
    * evaluates the IDENTICAL patterns. Declarative XML-by-regex is
    * correct here because the protocol pins the vocabulary (fixed tag
    * set, no attributes on the extracted tags, no nesting inside
    * entries); it is NOT a general XML parser and documents that.
    */
  def parseSitemap(xml: Column): Column = {
    val entryBlocks = regexp_extract_all(xml,
      lit("(?is)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"), lit(1))
    def field(b: Column, tag: String): Column = {
      val v = regexp_extract(b, s"(?is)<$tag>\\s*(.*?)\\s*</$tag>", 1)
      when(v === "", lit(null).cast("string")).otherwise(v)
    }
    def unent(c: Column): Column =
      Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&amp;" -> "&")
        .foldLeft(c) { case (x, (e, ch)) => replace(x, lit(e), lit(ch)) }
    struct(
      (size(regexp_extract_all(xml, lit("(?is)<sitemapindex[\\s>]"), lit(0))) > 0)
        .as("is_index"),
      transform(entryBlocks, b => struct(
        unent(field(b, "loc")).as("loc"),
        field(b, "lastmod").as("lastmod"),
        field(b, "changefreq").as("changefreq"),
        field(b, "priority").cast("double").as("priority"))).as("entries"))
  }

  /** CJK ideograph character class, as EXPLICIT code-point ranges (the
    * BERT BasicTokenizer set: URO + ext A, compatibility ideographs, and
    * the supplementary ext B–F + compat-supplement planes). Ranges, not
    * `\p{Han}`: Java spells that class `\p{IsHan}` while RE2 spells it
    * `\p{Han}` — explicit `\x{...}` ranges are the one syntax BOTH
    * engines parse identically, so the DuckDB oracle evaluates the
    * IDENTICAL pattern (same rationale as [[BpePretokenPattern]]).
    */
  val CjkClass: String =
    "[\\x{4e00}-\\x{9fff}\\x{3400}-\\x{4dbf}\\x{f900}-\\x{faff}" +
      "\\x{20000}-\\x{2a6df}\\x{2a700}-\\x{2ebef}\\x{2f800}-\\x{2fa1f}]"

  /** Per-language SEGMENTATION ahead of the tokenizer families: isolate
    * every CJK ideograph with surrounding spaces (the published BERT
    * BasicTokenizer rule) so whitespace pretokenization — which degrades
    * to whole-sentence "tokens" on unspaced Chinese/Japanese text —
    * yields per-ideograph units instead. Kana, hangul, and Thai runs are
    * deliberately NOT char-split: char-splitting them is linguistically
    * wrong (they are alphabets/abugidas, not logographs), and proper
    * Thai word segmentation needs a dictionary — out of scope, documented
    * rather than faked. One codegen `regexp_replace` pass; compose as
    * `tokens(segmentCjk(text))` or ahead of BPE/WordPiece training.
    * Double spaces introduced at boundaries are harmless to the
    * `\s+`-splitting tokenizers downstream (and byte-exact replayable —
    * the oracle runs the identical pattern).
    */
  def segmentCjk(text: Column): Column =
    regexp_replace(text, s"($CjkClass)", " $1 ")

  /** RFC 9309 robots.txt evaluation — `struct(allowed, rule,
    * crawl_delay)` for one (robots text, agent token, URL path) row; see
    * [[graft.text.Robots]] for the exact semantics (group merge, longest
    * named agent match, longest-pattern precedence with allow winning
    * ties, `*`/`$` patterns). The politeness-join shape: broadcast the
    * per-host robots table against the URL census, then filter on
    * `.getField("allowed")` — the robots side is tiny (one row per host)
    * and the parse is memoized per executor thread across each host's
    * census rows.
    */
  def robotsCheck(robots: Column, agent: Column, path: Column): Column =
    SqlBridge.column(graft.functions.RobotsCheck(
      SqlBridge.expression(robots), SqlBridge.expression(agent), SqlBridge.expression(path)))

  /** Politeness-aware FETCH SCHEDULING — the step after [[robotsCheck]]
    * in a crawl frontier: drop disallowed URLs, then serialize each
    * host's fetches `crawl_delay` seconds apart (hosts proceed in
    * parallel; within a host, slot k fires at `k * delay`). Inputs:
    * `census(host, path)` and `robots(host, robots)`; returns
    * `(host, path, slot, fetch_at_s)`.
    *
    * Scale shape: the robots side is one row per host — BROADCAST — and
    * the only shuffle is the per-host window (key = host, the natural
    * frontier partitioning); the robots parse is memoized per executor
    * thread across each host's clustered rows. Slot order is
    * deterministic (path lexicographic), so the schedule replays
    * identically on any layout.
    */
  def fetchSchedule(
      census: org.apache.spark.sql.DataFrame,
      robots: org.apache.spark.sql.DataFrame,
      agent: String,
      defaultDelaySeconds: Double = 1.0): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("path")
    census.join(broadcast(robots), "host")
      .withColumn("__r", robotsCheck(col("robots"), lit(agent), col("path")))
      .filter(col("__r.allowed"))
      .withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .withColumn("fetch_at_s",
        round(col("slot") * coalesce(col("__r.crawl_delay"), lit(defaultDelaySeconds)), 4))
      .select(col("host"), col("path"), col("slot"), col("fetch_at_s"))
  }

  /** Parse a WAT METADATA record's JSON envelope — the companion format
    * the big public crawls publish next to their WARC segments (one
    * `metadata` record per crawled page, wrapping extracted metadata so
    * link-graph and header analyses never touch payload bytes):
    * `Envelope.WARC-Header-Metadata` (the original record's headers),
    * `Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata`
    * (Head.Title + the outlink list), and `Container` (the WARC file +
    * offset the page lives at — joinable straight into
    * [[graft.sources.WarcFetch]] for selective payload fetch). One
    * codegen `from_json`, no UDF; a malformed envelope parses to a null
    * struct (gate on the target URI), never a dropped row. Fields the
    * schema doesn't name are ignored, per from_json semantics — WAT
    * envelopes carry dozens of optional members.
    */
  def parseWat(line: Column): Column = {
    import org.apache.spark.sql.types._
    def s(n: String) = StructField(n, StringType, nullable = true)
    val htmlMeta = StructType(Seq(
      StructField("Head", StructType(Seq(s("Title"))), nullable = true),
      StructField("Links",
        ArrayType(StructType(Seq(s("path"), s("url"))), containsNull = true),
        nullable = true)))
    val schema = StructType(Seq(
      StructField("Envelope", StructType(Seq(
        StructField("WARC-Header-Metadata", StructType(Seq(
          s("WARC-Target-URI"), s("WARC-Type"), s("WARC-Date"))), nullable = true),
        StructField("Payload-Metadata", StructType(Seq(
          StructField("HTTP-Response-Metadata", StructType(Seq(
            StructField("HTML-Metadata", htmlMeta, nullable = true),
            StructField("Headers", StructType(Seq(s("Content-Type"))), nullable = true))),
            nullable = true))), nullable = true))), nullable = true),
      StructField("Container", StructType(Seq(s("Filename"), s("Offset"))),
        nullable = true)))
    from_json(line, schema)
  }

  /** Distinct lowercased registrable-host strings of a [[links]] array.
    * Trailing sentence punctuation is trimmed first (a bare URL at the
    * end of a sentence captures its period), then the authority component
    * is taken up to the first `/`, `?`, or `#`.
    */
  def linkDomains(linksCol: Column): Column =
    array_distinct(transform(linksCol, u =>
      lower(regexp_extract(regexp_replace(u, "[.,;:!?]+$", ""),
        "^[a-zA-Z]+://([^/?#]+)", 1))))

  /** URL CANONICALIZATION — the RefinedWeb/CCNet-style URL-level dedup
    * key: two crawls of one page usually differ only in surface form
    * (tracking params, fragment, www, default port, case of the
    * case-insensitive components), and URL dedup is the cheapest dedup
    * tier a web pipeline runs (no content read at all). Rules, in order:
    * trailing sentence punctuation trimmed (a bare URL at sentence end
    * captures its period), fragment stripped, scheme+authority
    * lowercased (path case PRESERVED — paths are case-sensitive),
    * default port (:80/:443) stripped, leading `www.` stripped,
    * `utm_*`/`gclid`/`fbclid` tracking params stripped with separator
    * cleanup, trailing slashes stripped.
    *
    * One narrow chain of codegen'd regexp_replace calls — RE2-safe (no
    * lookaround, no pattern backreferences) so the DuckDB oracle
    * evaluates the IDENTICAL patterns.
    */
  def canonicalUrl(url: Column): Column = {
    val noPunct = regexp_replace(url, "[.,;:!?]+$", "")
    val noFrag = regexp_replace(noPunct, "#.*$", "")
    // lowercase scheme://authority, keep the rest verbatim
    val lowered = concat(
      lower(regexp_extract(noFrag, "^([a-zA-Z]+://[^/?#]+)", 1)),
      regexp_replace(noFrag, "^[a-zA-Z]+://[^/?#]+", ""))
    val noPort = regexp_replace(lowered, "^(https?://[^/?#:]+):(80|443)(/|\\?|$)", "$1$3")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    val noTrack = regexp_replace(noWww, "([?&])(utm_[a-zA-Z]+|gclid|fbclid)=[^&#]*", "$1")
    val cleanSep = regexp_replace(regexp_replace(noTrack, "\\?&+", "?"), "&&+", "&")
    regexp_replace(regexp_replace(cleanSep, "[?&]+$", ""), "/+$", "")
  }

  /** Two-label public suffixes recognized by [[registeredDomain]] — a
    * DOCUMENTED SUBSET of the Mozilla Public Suffix List covering the
    * high-traffic ccTLD second-level registries plus the common private
    * registries (github.io, blogspot.com: their subdomains are
    * independent registrants, exactly why the PSL carries a private
    * section). Public `val`s so the SQL oracle interpolates the SAME
    * list — one source of truth, no drift. Production swaps in the full
    * published list; the ALGORITHM (longest-suffix match with the PSL
    * default `*` rule) is the complete one.
    */
  val PslTwoLabel: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp", "ad.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "org.mx", "gob.mx",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "co.kr", "or.kr", "ne.kr", "go.kr", "ac.kr",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "com.sg", "org.sg", "edu.sg",
    "com.tr", "org.tr", "gov.tr", "edu.tr",
    "com.ar", "com.tw", "com.hk", "com.my", "com.ph", "com.vn",
    "co.za", "org.za", "co.th", "co.id", "or.id", "co.il", "org.il",
    "com.pl", "com.ua", "com.ru", "com.eg", "com.sa", "com.pk", "com.ng",
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "appspot.com", "netlify.app", "vercel.app", "pages.dev",
    "cloudfront.net", "azurewebsites.net", "web.app", "firebaseapp.com")

  /** Three-label public suffixes (private-registry hosts one level
    * deeper); same subset discipline as [[PslTwoLabel]]. */
  val PslThreeLabel: Seq[String] = Seq(
    "s3.amazonaws.com", "blogspot.co.uk", "blogspot.com.au",
    "blogspot.com.br", "compute.amazonaws.com")

  /** REGISTERED DOMAIN (eTLD+1) — the key every per-domain pipeline
    * policy hangs off (RefinedWeb's per-domain caps, domain-level quality
    * priors, politeness grouping): the public suffix plus ONE registrant
    * label, found by longest-suffix match against the PSL with the PSL's
    * default `*` rule (an unknown TLD is itself a public suffix, so
    * `foo.bar.unknowntld` → `bar.unknowntld`).
    *
    * Input is a HOST (or authority — a `:port` is stripped, case folded,
    * one trailing dot dropped). NULL when no registered domain exists:
    * the host IS a bare public suffix (`co.uk`), a single label
    * (`localhost`), or an IPv4 literal (addresses are not names — the
    * PSL rule). One codegen'd CASE cascade over split-array slices, no
    * UDF, no shuffle; negative-index slices and the suffix IN-lists
    * replay verbatim in the SQL oracle.
    */
  def registeredDomain(host: Column): Column = {
    val h = lower(regexp_replace(regexp_replace(host, ":[0-9]+$", ""), "\\.$", ""))
    val parts = split(h, "\\.")
    val n = size(parts)
    val last2 = array_join(slice(parts, -2, 2), ".")
    val last3 = array_join(slice(parts, -3, 3), ".")
    val last4 = array_join(slice(parts, -4, 4), ".")
    when(h.rlike("^([0-9]{1,3}\\.){3}[0-9]{1,3}$"), lit(null).cast("string"))
      .when(n >= 4 && last3.isin(PslThreeLabel: _*), last4)
      .when(n === 3 && last3.isin(PslThreeLabel: _*), lit(null).cast("string"))
      .when(n >= 3 && last2.isin(PslTwoLabel: _*), last3)
      .when(n === 2 && last2.isin(PslTwoLabel: _*), lit(null).cast("string"))
      .when(n >= 2, last2)
      .otherwise(lit(null).cast("string"))
  }

  /** Markup-to-text extraction — the WET-style ingest step that turns
    * crawled HTML into the plain text every downstream pass (dedup,
    * quality, packing) consumes. One narrow chain of codegen'd
    * regexp_replace/replace calls, no UDF, no shuffle; composes BEFORE
    * [[c4CleanLines]] (block-closing tags become newlines so the line
    * heuristics still see line structure).
    *
    * Every pattern is restricted to RE2-compatible syntax (non-greedy
    * `.*?`, inline `(?is)` flags, NO backreferences — script and style
    * blocks get separate literal patterns) so the DuckDB oracle evaluates
    * the identical chain. Entity decoding handles the five predefined XML
    * entities + nbsp, `&amp;` LAST so `&amp;lt;` decodes to the literal
    * `&lt;` the author wrote, not `<`.
    *
    * Documents with no markup pass through with only whitespace
    * normalization (runs of spaces/tabs collapse, blank lines drop,
    * ends trim) — the catalog row proves pass-through on the unplanted
    * corpus.
    */
  def extractMarkup(text: Column): Column = {
    // strip script/style WITH content + comments in ONE alternation pass
    // (separate script/style branches: RE2 has no backreferences)
    val stripped = regexp_replace(text,
      "(?is)<script\\b[^>]*>.*?</script>|<style\\b[^>]*>.*?</style>|<!--.*?-->", " ")
    // block-closing tags keep line structure for downstream line heuristics
    val blocksAsNl = regexp_replace(stripped,
      "(?i)</p[ \t]*>|</h[1-6]>|</li>|</div>|</tr>|<br[^>]*>", "\n")
    val noTags = regexp_replace(blocksAsNl, "<[^>]*>", " ")
    // predefined entities; &amp; last (see scaladoc)
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    // whitespace: collapse space/tab runs, then any run of newlines and
    // their surrounding spaces to one newline, then trim the ends
    val oneSpace = regexp_replace(decoded, "[ \t]+", " ")
    val oneNl = regexp_replace(oneSpace, "( ?\n ?)+", "\n")
    regexp_replace(oneNl, "^[ \n]+|[ \n]+$", "")
  }

  /** The document's DISTINCT token-n-gram shingles as STRINGS (a doc
    * shorter than n tokens contributes its whole text — the shingle
    * kernels' short-doc rule), declaratively: any engine with the same
    * tokenizer replays it, so operators built on it hash-match without
    * betting on 64-bit hash collisions.
    *
    * `toks` must be a MATERIALIZED token-array column (a plain reference):
    * the transform lambda inlines its input into every element's slice,
    * so handing `tokens(text)` directly re-tokenizes once per shingle —
    * O(len²) per document. Callers project the token array first (see
    * [[docNovelty]]).
    */
  def shingleStrings(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))

  /** Per-document n-gram NOVELTY — the inverse-boilerplate diagnostic a
    * curation pipeline tracks next to its dedup rates: the fraction of a
    * document's distinct n-gram shingles that appear in NO other document
    * (after span/line dedup has cut the repeats, what remains should
    * score high; template-stamped docs score near zero). Returns
    * (doc_id, n_shingles, n_unique, novelty).
    *
    * Scale shape: one narrow shingle explode, one partial-aggregated
    * count per shingle (the [[graft.dedup.Dedup.duplicateSpans]] shuffle
    * shape — rows ≈ token count, never a pair join), one hash join back,
    * one per-doc aggregate. String shingles, not hashes: exact by
    * construction, and the tokens are already materialized for the
    * explode so the concat costs no extra pass.
    */
  def docNovelty(
      docs: org.apache.spark.sql.DataFrame,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // fused kernel: tokenize + shingle + distinct in one loop per document
    // (byte-identical to the [[shingleStrings]] HOF chain, which re-walked
    // its expression tree per shingle index); the gram stream is evaluated
    // on BOTH sides of the self-join below, so the kernel pays off twice
    val grams = docs
      .select(col(idCol).as("doc_id"),
        explode(SqlBridge.column(graft.functions.WordShingleSet(
          SqlBridge.expression(col(textCol)), n))).as("g"))
    // per (doc, g) already distinct, so count(*) = docs containing g
    val docFreq = grams.groupBy("g").agg(count(lit(1)).as("docs_with"))
    grams.join(docFreq, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("docs_with") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty", col("n_unique").cast("double") / col("n_shingles"))
  }

  /** Per-source corpus-statistics diagnostics — the distribution health
    * check a mixing pipeline runs per domain: token/type counts,
    * type-token ratio, and the ZIPF SLOPE (OLS fit of log frequency on
    * log rank over the top-`topK` tokens; natural text sits near −1,
    * template spam flattens, id-dumps steepen). Deterministic: ranks
    * break ties by token, the fit is a closed-form function of the
    * top-K rows. Returns (source, n_tokens, n_types, ttr, zipf_slope).
    *
    * Scale shape: one (source, token) partial-aggregated count shuffle;
    * the `row_number <= topK` filter plans WindowGroupLimit, so each
    * source's rank exchange carries ≤ topK rows per map partition, never
    * the vocabulary; the fit aggregates K rows per source.
    */
  def corpusZipf(
      docs: org.apache.spark.sql.DataFrame,
      topK: Int = 100,
      sourceCol: String = "source",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    require(topK >= 2, s"topK must be >= 2, got $topK")
    val tf = docs.select(col(sourceCol).as("source"), explode(tokens(col(textCol))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("freq"))
    val totals = tf.groupBy("source")
      .agg(sum("freq").as("n_tokens"), count(lit(1)).as("n_types"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("freq").desc, col("token"))
    val x = log(col("rank").cast("double"))
    val y = log(col("freq").cast("double"))
    val fit = tf.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .groupBy("source")
      .agg(count(lit(1)).cast("double").as("k"),
        sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"), sum(x * x).as("sxx"))
      .withColumn("__den", col("k") * col("sxx") - col("sx") * col("sx"))
      .withColumn("zipf_slope",
        when(col("__den") === 0.0, lit(0.0)) // degenerate: one distinct token
          .otherwise((col("k") * col("sxy") - col("sx") * col("sy")) / col("__den")))
    totals.join(fit.select("source", "zipf_slope"), Seq("source"))
      .withColumn("ttr", col("n_types").cast("double") / col("n_tokens"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("ttr"), col("zipf_slope"))
  }
}
