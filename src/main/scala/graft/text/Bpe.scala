package graft.text

/** Real byte-pair-encoding token counting over a merges table in the
  * standard `merges.txt` format (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"; the GPT-2 tokenizer
  * ships its 50k merge rules in exactly this layout — one "left right"
  * pair per line in priority order, an optional `#version` header, and
  * `Ġ` spelling a leading space). [[DemoMerges]] is a compact
  * self-authored English merge list so the engine is self-contained
  * offline; [[loadMerges]] parses a full 50k-line GPT-2 merges.txt
  * unchanged — swap it in and the counts become GPT-2 counts. The
  * expression kernel ([[graft.functions.BpeTokenCount]]) caches the
  * parsed table once per JVM, so a production-size table is broadcast
  * weight, not per-row weight.
  *
  * The encode loop is the published BPE algorithm: a pretoken (from
  * [[TextAnalysis.BpeTokenPattern]], the same RE2-safe pretokenizer the
  * approximate counter uses) splits into single-character symbols with
  * spaces spelled Ġ; the lowest-rank adjacent pair is merged — all
  * non-overlapping occurrences, left to right — until no adjacent pair
  * holds a rank; the surviving symbol count is the token count.
  */
object Bpe {

  /** Compact English merge list in standard merges.txt layout. Rules
    * chain consistently with their ranks (a rule whose left/right symbol
    * can never form because a lower-ranked rule splits it differently
    * would be dead weight — BPE training produces chains, so does this
    * list: " the" reaches one token via t+h → th+e → Ġ+the).
    */
  val DemoMerges: Seq[String] = Seq(
    "#version: 0.2",
    "t h",
    "th e",
    "i n",
    "a n",
    "an d",
    "o u",
    "e r",
    "o n",
    "r e",
    "Ġ t",
    "Ġ the",
    "Ġ a",
    "Ġ and",
    "Ġ i",
    "Ġi s",
    "Ġ o",
    "Ġo f",
    "Ġ w",
    "Ġ c",
    "Ġ s",
    "Ġ b",
    "in g",
    "e d",
    "e s",
    "o r",
    "a t",
    "c a",
    "ca t")

  /** Parse merges.txt lines → pair → rank (line order = priority).
    * Comment/blank lines are skipped without consuming a rank; a trailing
    * CR (Windows checkout) is stripped, token content is not trimmed
    * (merge symbols never contain literal spaces — Ġ spells them).
    */
  def loadMerges(lines: IterableOnce[String]): Map[(String, String), Int] =
    lines.iterator
      .map(_.stripSuffix("\r"))
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .zipWithIndex
      .flatMap { case (l, i) =>
        val sp = l.split(" ")
        if (sp.length == 2) Some((sp(0), sp(1)) -> i) else None
      }
      .toMap

  /** TRAIN a BPE merge table from a corpus (Sennrich et al. 2016 §3.2 —
    * the algorithm that produced every merges.txt this file consumes).
    * Spark-first shape, and the one production tokenizer trainers use:
    * the corpus streams ONCE through a distributed pretoken-frequency
    * aggregation (partial-agg shuffle on the pretoken — the result is
    * vocabulary-sized, not corpus-sized), deterministically capped to the
    * `maxWords` most frequent pretokens (count desc, pretoken asc — the
    * standard practical bound: the rare tail cannot move pair counts),
    * and the published merge loop then runs DRIVER-side over that
    * word-frequency dict: per round, count every adjacent symbol pair
    * weighted by word frequency, merge the most frequent pair (ties break
    * lexicographically, so training is layout- and engine-independent),
    * stop at `numMerges` rules or when the best pair drops below
    * `minFrequency` (subword-nmt's early-stop). Driver work is
    * O(maxWords · avgLen · numMerges) — corpus-size-free.
    *
    * Returns standard merges.txt lines (header included): feed them
    * straight to [[loadMerges]] / the `BpeTokenCount` kernel, and the
    * apply side's left-to-right non-overlapping merge is the same
    * convention the training loop uses below.
    */
  def train(
      docs: org.apache.spark.sql.DataFrame,
      numMerges: Int,
      textCol: String = "text",
      maxWords: Int = 100000,
      minFrequency: Long = 2L): Seq[String] = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.functions._
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

    trainLoop(freqs.map { case (w, c) =>
      (w.iterator.map(ch => if (ch == ' ') "Ġ" else ch.toString).toArray, c)
    }, numMerges, minFrequency)
  }

  /** BYTE-LEVEL BPE training — [[train]]'s GPT-2-convention twin, the
    * trainer whose output [[encodeByteTokens]] / the `byteLevel = true`
    * kernel mode consume: pretokenize with the published split regex
    * ([[Gpt2SplitCompiled]], Unicode `\s`), spell each pretoken's UTF-8
    * bytes through [[ByteEncoder]] (one initial symbol per BYTE — the
    * alphabet is closed at 256, so the trained table encodes ANY byte
    * sequence with zero unknowns), then the same count-scored merge loop.
    * Same Spark shape as [[train]]: one distributed pretoken-frequency
    * pass (vocabulary-sized result, deterministically capped), merge loop
    * driver-side — corpus-size-free.
    */
  def trainBytes(
      docs: org.apache.spark.sql.DataFrame,
      numMerges: Int,
      textCol: String = "text",
      maxWords: Int = 100000,
      minFrequency: Long = 2L): Seq[String] = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val freqs: Array[(String, Long)] = docs
      .select(col(textCol).cast("string").as("t")).as[String]
      .mapPartitions { iter =>
        val m = Gpt2SplitCompiled.matcher("")
        iter.flatMap { t =>
          if (t == null) Iterator.empty
          else {
            m.reset(t)
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            while (m.find()) buf += m.group()
            buf.iterator
          }
        }
      }
      .toDF("w").groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .as[(String, Long)].collect()
    trainLoop(freqs.map { case (w, c) =>
      val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (bytes.map(b => String.valueOf(ByteEncoder(b & 0xff))), c)
    }, numMerges, minFrequency)
  }

  /** The published count-scored merge loop shared by [[train]] and
    * [[trainBytes]]: per round count adjacent pairs weighted by word
    * frequency, merge the most frequent (ties break (left, right)
    * lexicographically — layout- and engine-independent), stop at
    * `numMerges` rules or when the best pair drops below `minFrequency`.
    */
  private def trainLoop(
      words0: Array[(Array[String], Long)],
      numMerges: Int,
      minFrequency: Long): Seq[String] = {
    var words = words0
    val merges = Seq.newBuilder[String]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val (bestPair, bestCount) = pairCounts.minBy { case ((l, r), c) => (-c, l, r) }
        if (bestCount < minFrequency) exhausted = true
        else {
          merges += s"${bestPair._1} ${bestPair._2}"
          words = words.map { case (syms, c) =>
            if (syms.length < 2) (syms, c)
            else {
              val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == bestPair._1 && syms(j + 1) == bestPair._2) {
                  out += syms(j) + syms(j + 1)
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
    }
    Seq("#version: 0.2") ++ merges.result()
  }

  /** The published GPT-2 bytes→unicode table (openai/gpt-2 encoder.py's
    * `bytes_to_unicode`): printable-byte ranges 33–126, 161–172, 174–255
    * map to themselves; the remaining 68 bytes map, in increasing byte
    * order, to codepoints 256 + n — so byte 0x20 (space) becomes Ġ
    * (U+0120), 0x0A (newline) Ċ, 0x09 (tab) ĉ. Every byte gets a
    * PRINTABLE single-char spelling, which is what lets byte-level BPE
    * store its vocab as plain strings and encode ANY byte sequence with
    * zero unknown tokens.
    */
  val ByteEncoder: Array[Char] = {
    val enc = new Array[Char](256)
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    var b = 0
    while (b < 256) {
      if (direct(b)) enc(b) = b.toChar
      else { enc(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    enc
  }

  /** Inverse of [[ByteEncoder]]: mapped char → original byte. */
  val ByteDecoder: Map[Char, Byte] =
    ByteEncoder.iterator.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** The published GPT-2 pretokenizer regex (contractions, optionally
    * space-prefixed letter/digit/symbol runs, whitespace with the
    * trailing-run lookahead). Compile with UNICODE_CHARACTER_CLASS so
    * `\s` matches Unicode whitespace (NBSP, U+2028, …) exactly as the
    * Python `regex` module the published tokenizer uses.
    */
  val Gpt2SplitPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  /** Compiled [[Gpt2SplitPattern]] with Unicode character classes — build
    * matchers from this, never recompile per row.
    */
  val Gpt2SplitCompiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      Gpt2SplitPattern, java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** BYTE-LEVEL encode of one pretoken — the published GPT-2 algorithm:
    * UTF-8-encode the pretoken, spell each byte via [[ByteEncoder]]
    * (one initial symbol PER BYTE, so a 3-byte CJK char starts as three
    * symbols), then run the same lowest-rank-first merge loop as
    * [[encodeTokens]]. With a real GPT-2 merges.txt the result is
    * byte-identical to the production tokenizer; non-ASCII text gets
    * byte-fallback granularity instead of the codepoint mode's
    * char-per-symbol approximation.
    */
  def encodeByteTokens(pretoken: String, ranks: Map[(String, String), Int]): Array[String] = {
    if (pretoken.isEmpty) return Array.empty
    val bytes = pretoken.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val symbols = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      symbols(i) = String.valueOf(ByteEncoder(bytes(i) & 0xff))
      i += 1
    }
    mergeLoop(symbols, ranks)
  }

  /** Map a byte-level piece (or joined pieces) back to its original
    * bytes — the decode half of the [[ByteEncoder]] round trip.
    */
  def decodePieceBytes(piece: String): Array[Byte] = {
    val out = new Array[Byte](piece.length)
    var i = 0
    while (i < piece.length) {
      out(i) = ByteDecoder.getOrElse(piece.charAt(i),
        throw new IllegalArgumentException(
          s"not a byte-level BPE piece char: U+${piece.charAt(i).toInt.toHexString} in '$piece'"))
      i += 1
    }
    out
  }

  /** Token count of one pretoken after applying `ranks` to exhaustion. */
  def countTokens(pretoken: String, ranks: Map[(String, String), Int]): Int =
    encodeTokens(pretoken, ranks).length

  /** The token PIECES of one pretoken after applying `ranks` to
    * exhaustion — the full tokenizer output, GPT-2 byte-level convention
    * (space → Ġ), of which [[countTokens]] is the length. Joining the
    * pieces and mapping Ġ back to space reconstructs the pretoken
    * exactly (round-trip gated in the `bpe_encode` catalog row).
    */
  def encodeTokens(pretoken: String, ranks: Map[(String, String), Int]): Array[String] = {
    if (pretoken.isEmpty) return Array.empty
    mergeLoop(pretoken.iterator.map(c => if (c == ' ') "Ġ" else c.toString).toArray, ranks)
  }

  /** The published merge loop shared by the codepoint and byte-level
    * encoders: find the lowest-ranked adjacent pair, merge ALL its
    * non-overlapping occurrences left to right, repeat until no adjacent
    * pair holds a rank. (Each distinct pair has a distinct rank —
    * zipWithIndex — so "rank == best" selects exactly one bigram per
    * round, the same bigram the published `min(pairs, key=rank)` picks.)
    */
  private def mergeLoop(
      symbols0: Array[String], ranks: Map[(String, String), Int]): Array[String] = {
    var symbols = symbols0
    var done = false
    while (!done && symbols.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < symbols.length - 1) {
        val r = ranks.getOrElse((symbols(i), symbols(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val out = new scala.collection.mutable.ArrayBuffer[String](symbols.length)
        var j = 0
        while (j < symbols.length) {
          if (j < symbols.length - 1 &&
              ranks.getOrElse((symbols(j), symbols(j + 1)), Int.MaxValue) == best) {
            out += symbols(j) + symbols(j + 1)
            j += 2
          } else {
            out += symbols(j)
            j += 1
          }
        }
        symbols = out.toArray
      }
    }
    symbols
  }
}
