package graft

import org.apache.spark.sql.functions._
import graft.functions.BlocklistAhoKernel
import graft.text.TextAnalysis

/** The Aho–Corasick blocklist kernel must count EXACTLY like the
  * compiled `(?i)\b(sorted alternation)\b` regex — leftmost start,
  * first-listed boundary-valid alternative at that start, continue past
  * the match — or the two forms aren't interchangeable.
  */
class BlocklistAhoSpec extends SparkTestBase {

  /** Reference: the sorted alternation with EXPLICIT ASCII-class
    * boundaries. RE2 (the DuckDB oracle) defines \b over ASCII \w; Java's
    * \b is Unicode-aware (a CJK letter is a word char), so plain
    * blocklistPattern through java.util.regex diverges from RE2 exactly
    * when an entry abuts a non-ASCII LETTER. The kernel implements the
    * RE2/oracle semantics, so the reference here spells the ASCII
    * boundary as lookarounds.
    */
  private def regexCount(text: String, words: Seq[String]): Long = {
    val alt = TextAnalysis.blocklistPattern(words)
      .stripPrefix("(?i)\\b").stripSuffix("\\b")
    val m = java.util.regex.Pattern
      .compile(s"(?i)(?<![a-zA-Z0-9_])$alt(?![a-zA-Z0-9_])").matcher(text)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  private def ahoCount(text: String, words: Seq[String]): Long =
    BlocklistAhoKernel.count(
      org.apache.spark.unsafe.types.UTF8String.fromString(text),
      BlocklistAhoKernel.encode(words))

  private def check(text: String, words: Seq[String]): Unit =
    assert(ahoCount(text, words) === regexCount(text, words),
      s"text='$text' words=$words")

  test("boundary semantics: whole-word, superstring rejected, edges, case") {
    val ws = Seq("contraband", "verboten")
    check("Contraband at start", ws)
    check("ends with VERBOTEN", ws)
    check("contrabands is a superstring", ws) // \b fails inside the word
    check("xcontraband fails left boundary", ws)
    check("contraband-verboten hyphen is a boundary", ws) // both hit
    check("contraband", ws)
    check("", ws)
    check("nothing here", ws)
  }

  test("hyphen and phrase entries, overlap resolution") {
    val ws = Seq("e-mail", "mail", "big bad wolf", "bad")
    check("send e-mail now", ws) // e-mail wins at its start; mail consumed
    check("mail me", ws)
    check("the big bad wolf is bad", ws)
    check("big bad wolfs", ws) // phrase \b fails; interior 'bad' still hits
    check("e-mail e-mail mail", ws)
  }

  test("prefix chains and case-order ties follow the sorted alternation") {
    // "foo" and "foo-bar" can BOTH be boundary-valid at one start; the
    // sorted alternation tries "foo" first (prefix sorts first)
    check("a foo-bar b", Seq("foo", "foo-bar"))
    // original-case sorting: "FOO-BAR" < "foo" in ASCII, so the LONGER
    // entry is tried (and matches) first — the kernel must reproduce that
    check("a foo-bar b", Seq("FOO-BAR", "foo"))
    check("foo foo-bar foo", Seq("FOO-BAR", "foo"))
    // case variants folding to one trie path, distinct alternation slots
    check("Foo foo FOO", Seq("Foo", "foo"))
  }

  test("non-ASCII text chars are non-word for ASCII/RE2 boundaries") {
    val ws = Seq("bad")
    check("é bad é", ws)
    check("日本badtext", ws) // boundary ok left, 't' after fails right → 0
    check("日本bad語", ws) // both sides non-word under ASCII \w → 1 (RE2; Java \b would say 0)
    check("🦙bad🦙", ws)
    assert(ahoCount("日本bad語", ws) === 1L)
  }

  test("randomized equivalence sweep (seeded)") {
    val rnd = new scala.util.Random(42)
    val vocab = Seq("a", "ab", "aba", "b", "ba", "a-b", "a b", "A", "AB",
      "aB-a", "cat", "CAT-dog", "cat-dog-cat", "c", "0a", "a0", "x9 y")
    val chars = "aAbBc0 9-_.é\n"
    (1 to 500).foreach { _ =>
      val words = rnd.shuffle(vocab).take(1 + rnd.nextInt(vocab.length - 1))
      val text = (0 until rnd.nextInt(30)).map(_ => chars(rnd.nextInt(chars.length))).mkString
      check(text, words)
    }
  }

  test("expression: planted large list over the corpus matches the regex form") {
    val big = (0 until 2000).map(i => f"badword$i%04d") ++
      Seq("contraband", "verboten", "big bad phrase", "e-mail")
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
      .union(Seq((900001L, "Badword0042 and badword1999 and e-mail"),
        (900002L, "a big bad phrase appears"),
        (900003L, "badword99999 is not an entry; badword0street neither")).toDF("doc_id", "text"))
    val both = docs.select(
        TextAnalysis.blocklistHitsAho(col("text"), big).as("aho"),
        TextAnalysis.blocklistHits(col("text"), big).as("re"))
    assert(both.filter(col("aho") =!= col("re")).count() === 0)
    // the planted rows actually hit
    assert(both.agg(sum("aho")).head.getLong(0) >= 4L)
  }

  test("validation: edge hyphen/space and non-ASCII entries rejected") {
    intercept[IllegalArgumentException](ahoCount("x", Seq("-bad")))
    intercept[IllegalArgumentException](ahoCount("x", Seq("bad ")))
    intercept[IllegalArgumentException](ahoCount("x", Seq("bäd")))
    intercept[IllegalArgumentException](ahoCount("x", Seq.empty))
  }
}
