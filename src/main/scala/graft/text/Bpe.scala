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

  /** Token count of one pretoken after applying `ranks` to exhaustion. */
  def countTokens(pretoken: String, ranks: Map[(String, String), Int]): Int = {
    if (pretoken.isEmpty) return 0
    var symbols: Array[String] =
      pretoken.iterator.map(c => if (c == ' ') "Ġ" else c.toString).toArray
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
    symbols.length
  }
}
