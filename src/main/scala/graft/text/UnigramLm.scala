package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer TRAINING and application (Kudo 2018, "Subword
  * Regularization" §3 — the SentencePiece unigram algorithm, the other
  * production tokenizer family next to [[Bpe.train]]'s merge learning).
  *
  * Spark-first shape, corpus-size-free after one pass:
  *   1. the corpus streams ONCE through the same distributed
  *      pretoken-frequency aggregation as [[Bpe.train]] (partial-agg
  *      shuffle on the pretoken; result is vocabulary-sized),
  *      deterministically capped to `maxWords` (count desc, word asc);
  *      spaces spell `▁` (U+2581, the SentencePiece convention).
  *   2. seed vocabulary: every substring of the capped words up to
  *      `maxPieceLen`, occurrence-counted (long arithmetic — exact),
  *      deterministically capped to `seedSize`: ALL single characters
  *      (segmentability invariant) + the most frequent multi-character
  *      pieces (count desc, piece asc).
  *   3. EM: the E-step is DISTRIBUTED over the capped word table —
  *      per word a forward-backward pass over the lattice of vocab
  *      pieces (log space), emitting per-(piece, word) expected counts;
  *      the M-step reduces them per piece with the contributions SORTED
  *      BY WORD before summation (groupByKey + in-group sort), so the
  *      float sum order is a pure function of the data — byte-identical
  *      results under any partitioning — and normalizes on the driver,
  *      which holds only the vocab-bounded table.
  *   4. pruning (Kudo's repeat-until-size loop, deterministic form):
  *      after each `emIters` EM steps, drop the lowest-probability
  *      multi-character pieces down to
  *      max(vocabSize, ⌈size·(1−pruneRate)⌉) (prob desc, piece asc;
  *      single characters never prune), renormalize, repeat while the
  *      vocab exceeds `vocabSize`; then `emIters` final EM steps.
  *
  * Scale: the corpus is touched exactly once; every later stage is
  * bounded by maxWords × maxPieceLen — at 100 TB the word table is
  * millions of rows, the E-step lattice shuffle is
  * words × len × maxPieceLen rows (bounded, not corpus-sized), and the
  * driver never holds more than the vocabulary.
  *
  * Application ([[viterbiCount]] / [[countTokens]]): max-probability
  * Viterbi segmentation with deterministic tie-breaks (higher score,
  * then fewer pieces, then longest last piece); characters outside the
  * vocabulary segment as single pieces at `unkLogProb` (SentencePiece's
  * unk floor).
  */
object UnigramLm {

  val SpaceMark = '▁'

  /** Train unigram-LM pieces: returns (piece, logProb) sorted by piece.
    * Probabilities are full-precision doubles; round for display at the
    * caller (the catalog row rounds to 4dp).
    */
  def train(
      docs: DataFrame,
      vocabSize: Int,
      textCol: String = "text",
      maxPieceLen: Int = 8,
      seedSize: Int = 1000000,
      emIters: Int = 1,
      pruneRate: Double = 0.25,
      maxWords: Int = 100000): Seq[(String, Double)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(vocabSize > 0, "vocabSize must be positive")
    require(emIters > 0 && maxPieceLen > 0 && pruneRate > 0 && pruneRate < 1,
      s"need emIters > 0, maxPieceLen > 0, 0 < pruneRate < 1")

    // 1. capped word-frequency table — the ONE corpus-sized pass
    val pat = TextAnalysis.BpeTokenPattern
    val words = docs
      .select(col(textCol).cast("string").as("t")).as[String]
      .mapPartitions { iter =>
        val m = java.util.regex.Pattern.compile(pat)
        iter.flatMap { t =>
          if (t == null) Iterator.empty
          else {
            val mm = m.matcher(t)
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            while (mm.find()) buf += mm.group().replace(' ', SpaceMark)
            buf.iterator
          }
        }
      }
      .toDF("w").groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .as[(String, Long)]
      .persist()

    // 2. seed vocabulary (long counts — exact): all singles + top multis
    val pieceCounts = words.flatMap { case (w, n) =>
      for {
        i <- 0 until w.length
        j <- (i + 1) to math.min(w.length, i + maxPieceLen)
      } yield (w.substring(i, j), n)
    }.toDF("piece", "cnt").groupBy("piece").agg(sum("cnt").as("cnt"))
      .as[(String, Long)]
    val singles = pieceCounts.filter(p => p._1.length == 1).collect()
      .sortBy(_._1)
    require(singles.nonEmpty, "unigram train: empty corpus (no pretokens)")
    val nMulti = math.max(0, seedSize - singles.length)
    val multis = pieceCounts.filter(p => p._1.length > 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(nMulti).collect()
    val seed = (singles ++ multis).sortBy(_._1)
    val seedTotal = seed.map(_._2).sum.toDouble
    var vocab: Array[(String, Double)] =
      seed.map { case (p, c) => (p, math.log(c / seedTotal)) }
    require(vocabSize >= singles.length,
      s"vocabSize=$vocabSize below the ${singles.length} single characters — " +
        "pruning could never reach it without breaking segmentability")

    def emStep(cur: Array[(String, Double)]): Array[(String, Double)] = {
      val bc = spark.sparkContext.broadcast(cur.toMap)
      val maxLen = maxPieceLen
      // per-(piece, word) expected counts — a pure function of (word,
      // freq, vocab), independent of partitioning
      val contribs = words.flatMap { case (w, n) =>
        val lp = bc.value
        val len = w.length
        val NegInf = Double.NegativeInfinity
        @inline def logadd(a: Double, b: Double): Double =
          if (a == NegInf) b else if (b == NegInf) a
          else if (a >= b) a + math.log1p(math.exp(b - a))
          else b + math.log1p(math.exp(a - b))
        val alpha = Array.fill(len + 1)(NegInf); alpha(0) = 0.0
        var j = 1
        while (j <= len) {
          var i = math.max(0, j - maxLen)
          while (i < j) {
            lp.get(w.substring(i, j)) match {
              case Some(p) => alpha(j) = logadd(alpha(j), alpha(i) + p)
              case None =>
            }
            i += 1
          }
          j += 1
        }
        val z = alpha(len)
        if (z == NegInf) Iterator.empty // defensive: capped-word chars are all seeded
        else {
          val beta = Array.fill(len + 1)(NegInf); beta(len) = 0.0
          var i = len - 1
          while (i >= 0) {
            var jj = i + 1
            val hi = math.min(len, i + maxLen)
            while (jj <= hi) {
              lp.get(w.substring(i, jj)) match {
                case Some(p) => beta(i) = logadd(beta(i), p + beta(jj))
                case None =>
              }
              jj += 1
            }
            i -= 1
          }
          val acc = scala.collection.mutable.HashMap.empty[String, Double]
          i = 0
          while (i < len) {
            var jj = i + 1
            val hi = math.min(len, i + maxLen)
            while (jj <= hi) {
              val piece = w.substring(i, jj)
              lp.get(piece) match {
                case Some(p) =>
                  val c = math.exp(alpha(i) + p + beta(jj) - z)
                  acc(piece) = acc.getOrElse(piece, 0.0) + c
                case None =>
              }
              jj += 1
            }
            i += 1
          }
          acc.iterator.map { case (piece, c) => (piece, w, n * c) }
        }
      }
      // layout-independent reduction: per piece, contributions sorted by
      // word before the float sum (group size <= maxWords)
      val counts = contribs
        .groupByKey(_._1)
        .mapGroups { (piece, it) =>
          (piece, it.toArray.sortBy(_._2).map(_._3).sum)
        }
        .collect().toMap
      val total = cur.map { case (p, _) => counts.getOrElse(p, 0.0) }.sum
      cur.map { case (p, _) => (p, math.log(counts.getOrElse(p, 0.0) / total)) }
    }

    def prune(cur: Array[(String, Double)]): Array[(String, Double)] = {
      val keepTotal = math.min(cur.length - 1,
        math.max(vocabSize, math.ceil(cur.length * (1 - pruneRate)).toInt))
      val (sgl, multi) = cur.partition(_._1.length == 1)
      val kept = sgl ++ multi.sortBy { case (p, l) => (-l, p) }
        .take(math.max(0, keepTotal - sgl.length))
      val logNorm = math.log(kept.map { case (_, l) => math.exp(l) }.sum)
      kept.map { case (p, l) => (p, l - logNorm) }.sortBy(_._1)
    }

    while (vocab.length > vocabSize) {
      var it = 0
      while (it < emIters) { vocab = emStep(vocab); it += 1 }
      vocab = prune(vocab)
    }
    var it = 0
    while (it < emIters) { vocab = emStep(vocab); it += 1 }
    words.unpersist()
    vocab.sortBy(_._1).toSeq
  }

  /** Viterbi SEGMENTATION of one pretoken under (piece → logProb):
    * maximize total logProb; ties prefer fewer pieces, then the longest
    * last piece. Unknown single characters score `unkLogProb`. Returns
    * the piece sequence — a PARTITION of the pretoken, so joining the
    * pieces reconstructs it exactly (the `unigram_encode` row's gate).
    */
  def viterbiPieces(
      word: String,
      vocab: Map[String, Double],
      maxPieceLen: Int = 8,
      unkLogProb: Double = -20.0): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val score = Array.fill(n + 1)(Double.NegativeInfinity); score(0) = 0.0
    val count = Array.fill(n + 1)(Int.MaxValue); count(0) = 0
    val back = Array.fill(n + 1)(-1)
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        val lpOpt = vocab.get(word.substring(i, j))
          .orElse(if (j - i == 1) Some(unkLogProb) else None)
        lpOpt.foreach { lp =>
          if (score(i) != Double.NegativeInfinity) {
            val s = score(i) + lp
            val c = count(i) + 1
            // strictly better score, or tie with fewer pieces; equal
            // (score, count) keeps the earlier i = longest last piece
            if (s > score(j) || (s == score(j) && c < count(j))) {
              score(j) = s; count(j) = c; back(j) = i
            }
          }
        }
        i += 1
      }
      j += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { out += word.substring(back(p), p); p = back(p) }
    out.reverseIterator.toArray
  }

  /** Viterbi piece count of one pretoken — [[viterbiPieces]]' length
    * without materializing the pieces.
    */
  def viterbiCount(
      word: String,
      vocab: Map[String, Double],
      maxPieceLen: Int = 8,
      unkLogProb: Double = -20.0): Int = {
    val n = word.length
    if (n == 0) return 0
    val score = Array.fill(n + 1)(Double.NegativeInfinity); score(0) = 0.0
    val count = Array.fill(n + 1)(Int.MaxValue); count(0) = 0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        val lpOpt = vocab.get(word.substring(i, j))
          .orElse(if (j - i == 1) Some(unkLogProb) else None)
        lpOpt.foreach { lp =>
          if (score(i) != Double.NegativeInfinity) {
            val s = score(i) + lp
            val c = count(i) + 1
            // strictly better score, or tie with fewer pieces; equal
            // (score, count) keeps the earlier i = longest last piece
            if (s > score(j) || (s == score(j) && c < count(j))) {
              score(j) = s; count(j) = c
            }
          }
        }
        i += 1
      }
      j += 1
    }
    count(n)
  }

  /** Distributed token counting with a trained vocabulary: pretokenize
    * like training (spaces → `▁`), Viterbi-count each pretoken, sum per
    * document. The vocab broadcasts; one scan, no shuffle.
    */
  def countTokens(
      docs: DataFrame,
      vocab: Seq[(String, Double)],
      idCol: String = "doc_id",
      textCol: String = "text",
      maxPieceLen: Int = 8,
      unkLogProb: Double = -20.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab.toMap)
    val pat = TextAnalysis.BpeTokenPattern
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { iter =>
        val m = java.util.regex.Pattern.compile(pat)
        iter.map { case (id, t) =>
          if (t == null) (id, 0L)
          else {
            val mm = m.matcher(t)
            var total = 0L
            while (mm.find())
              total += viterbiCount(mm.group().replace(' ', SpaceMark),
                bc.value, maxPieceLen, unkLogProb)
            (id, total)
          }
        }
      }
      .toDF(idCol, "n_tokens")
  }
}
