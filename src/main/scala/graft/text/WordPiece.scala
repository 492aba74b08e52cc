package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer — the THIRD production tokenizer family next to
  * [[Bpe]] (merge-rank BPE) and [[UnigramLm]] (SentencePiece unigram):
  * Schuster & Nakajima 2012 ("Japanese and Korean voice search"), the
  * algorithm behind the BERT vocabulary. Training is BPE-shaped but
  * merges the adjacent pair maximizing the LIKELIHOOD gain
  * `count(ab) / (count(a) * count(b))` instead of the raw pair count —
  * the classic consequence being that a rare-but-exclusive pair (a
  * symbol pair that only ever occurs together) merges before a frequent
  * promiscuous one. Non-word-initial symbols carry the `##` continuation
  * prefix; encoding is the published greedy longest-match-first
  * ("MaxMatch") walk with the whole-word `[UNK]` convention.
  *
  * Spark-first shape (same as [[Bpe.train]]): the corpus streams ONCE
  * through a distributed pretoken-frequency aggregation (partial-agg
  * shuffle on the pretoken; result is vocabulary-sized), deterministically
  * capped to the `maxWords` most frequent pretokens (count desc, word
  * asc), and the merge loop runs driver-side over that word-frequency
  * dict — O(maxWords · avgLen · numMerges), corpus-size-free. Ties on
  * the score break (left, right) lexicographically, so training is
  * layout- and engine-independent; scores are exact integer ratios, so
  * a replaying engine reproduces them bit-for-bit.
  *
  * Symbol granularity is UTF-16 CODE UNITS (the same convention as
  * [[Bpe]]): a supplementary character (emoji, CJK extension) enters
  * training as its two surrogate units, so vocab pieces can be
  * unpaired-surrogate strings that are not valid standalone text.
  * Train and MaxMatch share the convention, so encoding stays
  * internally round-trip consistent — but piece boundaries differ from
  * codepoint-segmenting WordPiece implementations (BERT's reference
  * tokenizer) on supplementary-plane text. Pre-normalize or strip such
  * text if vocab pieces must be displayable.
  */
object WordPiece {

  val ContinuationPrefix = "##"
  val Unk = "[UNK]"

  /** Trained model: `merges` in rank order (left, right, score) and the
    * full piece vocabulary — training alphabet (word-initial chars plain,
    * continuations ##-prefixed, UTF8-sorted) followed by merged pieces in
    * rank order. [[pieceSet]] is what the encode walk probes.
    */
  final case class Model(merges: Seq[(String, String, Double)], vocab: Seq[String]) {
    lazy val pieceSet: Set[String] = vocab.toSet
  }

  /** Train a WordPiece model. `minPairCount` is an ELIGIBILITY floor, not
    * an early stop: pairs seen fewer times are excluded from selection
    * each round, and training ends only when no eligible pair remains.
    * (A best-pair stop — subword-nmt's rule — is sound under count
    * scoring, where best = max count; under WordPiece's likelihood score
    * a rare-but-exclusive pair ranks FIRST, so stopping there would
    * truncate training for the whole corpus on one singleton pair.)
    */
  def train(
      docs: DataFrame,
      numMerges: Int,
      textCol: String = "text",
      maxWords: Int = 100000,
      minPairCount: Long = 2L): Model = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    val spark = docs.sparkSession
    import spark.implicits._
    val pat = TextAnalysis.BpeTokenPattern
    val freqs: Array[(String, Long)] = docs
      .select(col(textCol).cast("string").as("t")).as[String]
      .mapPartitions { iter =>
        val m = java.util.regex.Pattern.compile(pat)
        iter.flatMap { t =>
          if (t == null) Iterator.empty
          else {
            val mm = m.matcher(t)
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            while (mm.find()) buf += mm.group()
            buf.iterator
          }
        }
      }
      .toDF("w").groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .as[(String, Long)].collect()

    var words: Array[(Array[String], Long)] = freqs
      .filter(_._1.nonEmpty)
      .map { case (w, c) =>
        (w.iterator.zipWithIndex.map { case (ch, i) =>
          if (i == 0) ch.toString else ContinuationPrefix + ch
        }.toArray, c)
      }
    // alphabet in UTF8-binary order — deterministic vocab layout
    val alphabet = scala.collection.SortedSet.empty[String] ++ words.iterator.flatMap(_._1)

    val merges = Seq.newBuilder[(String, String, Double)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length) {
          symCounts(syms(i)) = symCounts.getOrElse(syms(i), 0L) + c
          if (i < syms.length - 1) {
            val p = (syms(i), syms(i + 1))
            pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          }
          i += 1
        }
      }
      pairCounts.filterInPlace { case (_, c) => c >= minPairCount }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // score = count(ab) / (count(a) * count(b)); ties break lex so the
        // trajectory is engine-independent. Score ORDER is decided exactly:
        // double compare when clearly apart, exact BigInt cross-
        // multiplication when within float noise (Long products overflow
        // at billion-scale symbol counts, so never trust xc*sy in Long)
        def cmpScore(xc: Long, xl: String, xr: String,
                     yc: Long, yl: String, yr: String): Int = {
          val dx = xc.toDouble / (symCounts(xl).toDouble * symCounts(xr).toDouble)
          val dy = yc.toDouble / (symCounts(yl).toDouble * symCounts(yr).toDouble)
          if (dx > dy * (1 + 1e-9) || dy > dx * (1 + 1e-9)) java.lang.Double.compare(dx, dy)
          else (BigInt(xc) * BigInt(symCounts(yl)) * BigInt(symCounts(yr)))
            .compare(BigInt(yc) * BigInt(symCounts(xl)) * BigInt(symCounts(xr)))
        }
        val best = pairCounts.iterator.reduceLeft { (x, y) =>
          val ((xl, xr), xc) = x
          val ((yl, yr), yc) = y
          val cmp = cmpScore(xc, xl, xr, yc, yl, yr)
          if (cmp > 0) x
          else if (cmp < 0) y
          else if (Ordering[(String, String)].lteq((xl, xr), (yl, yr))) x else y
        }
        val ((bl, br), bc) = best
        val score = bc.toDouble / (symCounts(bl).toDouble * symCounts(br).toDouble)
        merges += ((bl, br, score))
        val merged = bl + br.stripPrefix(ContinuationPrefix)
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == bl && syms(j + 1) == br) {
                out += merged
                j += 2
              } else {
                out += syms(j)
                j += 1
              }
            }
            (out.toArray, c)
          }
        }
        round += 1
      }
    }
    val ms = merges.result()
    Model(ms, alphabet.toSeq ++ ms.map { case (l, r, _) => l + r.stripPrefix(ContinuationPrefix) })
  }

  /** Greedy longest-match-first pieces of one pretoken (BERT MaxMatch):
    * repeatedly the longest vocab prefix (continuations probed with the
    * ## prefix); ANY unmatched position collapses the whole word to
    * `[UNK]` — the published convention. A position-0 probe that would
    * match a `##`-MARKED vocab entry (a pretoken whose text literally
    * starts with "##" colliding with a continuation piece) is rejected:
    * matching it would mislabel word-initial text as a continuation and
    * break the strip-##-and-rejoin reconstruction; the walk falls through
    * to shorter prefixes (the "#" alphabet piece) or the [UNK] fallback.
    */
  def encodePieces(pretoken: String, vocab: Set[String]): Array[String] = {
    if (pretoken.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < pretoken.length) {
      var end = pretoken.length
      var found: String = null
      while (end > start && found == null) {
        val raw = pretoken.substring(start, end)
        val probe = if (start > 0) ContinuationPrefix + raw else raw
        if (vocab.contains(probe) &&
            !(start == 0 && probe.startsWith(ContinuationPrefix))) found = probe
        else end -= 1
      }
      if (found == null) return Array(Unk)
      out += found
      start = end
    }
    out.toArray
  }

  /** Piece COUNT of one pretoken — an independent count-only walk (no
    * piece buffer), the `count_consistent` twin of [[encodePieces]].
    */
  def countPieces(pretoken: String, vocab: Set[String]): Int = {
    if (pretoken.isEmpty) return 0
    var n = 0
    var start = 0
    while (start < pretoken.length) {
      var end = pretoken.length
      var len = -1
      while (end > start && len < 0) {
        val raw = pretoken.substring(start, end)
        val probe = if (start > 0) ContinuationPrefix + raw else raw
        if (vocab.contains(probe) &&
            !(start == 0 && probe.startsWith(ContinuationPrefix))) len = end - start
        else end -= 1
      }
      if (len < 0) return 1 // whole-word [UNK]
      n += 1
      start += len
    }
    n
  }

  /** Per-document WordPiece token counts under a trained model: pretokens
    * from the shared [[TextAnalysis.BpeTokenPattern]] partition of the
    * text, each counted by the greedy walk with the vocab BROADCAST — one
    * scan, no shuffle beyond the caller's.
    */
  def countTokens(
      docs: DataFrame,
      model: Model,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.pieceSet)
    val pat = TextAnalysis.BpeTokenPattern
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions { iter =>
        val m = java.util.regex.Pattern.compile(pat)
        val v = bc.value
        iter.map { case (id, text) =>
          val t = if (text == null) "" else text
          val mm = m.matcher(t)
          var n = 0L
          while (mm.find()) n += countPieces(mm.group(), v)
          (id, n)
        }
      }
      .toDF("doc_id", "n_tokens")
  }
}
