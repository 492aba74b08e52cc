package graft

import org.apache.spark.sql.functions._
import graft.text.{Bpe, TextAnalysis}

/** Byte-level (GPT-2/tiktoken-convention) BPE: the published
  * bytes→unicode table, the published split regex with Unicode \s, the
  * byte-symbol merge loop, and the kernel expressions behind
  * `token_count_bpe_bytes`.
  */
class ByteLevelBpeSpec extends SparkTestBase {

  private val ranks = Bpe.loadMerges(Bpe.DemoMerges)

  test("bytes_to_unicode table matches the published fixed points") {
    // printable ASCII/Latin-1 ranges map to themselves
    assert(Bpe.ByteEncoder('A'.toInt) === 'A')
    assert(Bpe.ByteEncoder('~'.toInt) === '~')
    assert(Bpe.ByteEncoder(0xa1) === '¡')
    assert(Bpe.ByteEncoder(0xff) === 'ÿ')
    // the 68 shifted bytes, in increasing byte order, land at 256 + n
    assert(Bpe.ByteEncoder(0) === 'Ā') // Ā
    assert(Bpe.ByteEncoder(9) === 'ĉ') // ĉ (tab)
    assert(Bpe.ByteEncoder(10) === 'Ċ') // Ċ (newline)
    assert(Bpe.ByteEncoder(32) === 'Ġ') // Ġ (space)
    assert(Bpe.ByteEncoder(127) === 'ġ') // ġ (DEL: 33 shifted bytes precede it)
    assert(Bpe.ByteEncoder(173) === 'Ń') // Ń (soft hyphen)
    // bijection: 256 distinct outputs, decoder inverts every byte
    assert(Bpe.ByteEncoder.distinct.length === 256)
    (0 until 256).foreach(b => assert(Bpe.ByteDecoder(Bpe.ByteEncoder(b)) === b.toByte))
  }

  test("GPT-2 split regex: contractions, unicode whitespace, trailing-run lookahead") {
    def split(s: String): Seq[String] = {
      val m = Bpe.Gpt2SplitCompiled.matcher(s)
      val out = Seq.newBuilder[String]
      while (m.find()) out += m.group()
      out.result()
    }
    assert(split("I'll they've") === Seq("I", "'ll", " they", "'ve"))
    assert(split("don't") === Seq("don", "'t"))
    // NBSP is Unicode whitespace: splits the letters, matched as \s+
    assert(split("a\u00a0b") === Seq("a", "\u00a0", "b"))
    // trailing whitespace run is ONE pretoken via \s+(?!\S); an interior
    // run keeps its last space attached to the next word
    assert(split("end  ") === Seq("end", "  "))
    assert(split("a  b") === Seq("a", " ", " b"))
    assert(split("abc123") === Seq("abc", "123"))
  }

  test("encodeByteTokens: byte fallback on non-ASCII, merges on ASCII") {
    // "the" merges to one piece exactly as codepoint mode
    assert(Bpe.encodeByteTokens("the", ranks).toSeq === Seq("the"))
    assert(Bpe.encodeByteTokens(" cat", ranks).toSeq === Seq("Ġc", "at"))
    // é = C3 A9 → Ã© as two unmerged byte symbols
    assert(Bpe.encodeByteTokens("é", ranks).toSeq === Seq("Ã", "©"))
    // 4-byte emoji → four byte symbols
    assert(Bpe.encodeByteTokens("🦙", ranks).length === 4)
    assert(Bpe.encodeByteTokens("", ranks).isEmpty)
  }

  test("piece round trip: decode(join(pieces)) == UTF-8 bytes, any text") {
    val texts = Seq("the cat sat", "naïve café", "我有一个", "🦙 llama\t\n",
      "a\u00a0b", "  ", "mixed 123 ¾½ end  ")
    texts.foreach { t =>
      val m = Bpe.Gpt2SplitCompiled.matcher(t)
      val sb = new StringBuilder
      while (m.find()) Bpe.encodeByteTokens(m.group(), ranks).foreach(sb ++= _)
      assert(Bpe.decodePieceBytes(sb.toString).toSeq ===
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq, s"text: $t")
    }
  }

  test("kernel expressions: count == size(pieces), corpus round trip") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val checked = docs.select(
        col("doc_id"), col("text"),
        TextAnalysis.bpeTokenCountBytes(col("text")).as("n"),
        TextAnalysis.bpeTokensBytes(col("text")).as("pieces"))
      .withColumn("consistent", size(col("pieces")).cast("long") === col("n"))
    assert(checked.filter(!col("consistent")).count() === 0)
    // executor-side byte round trip over the real corpus
    val bad = checked.select(col("text"), col("pieces")).as[(String, Seq[String])]
      .filter { case (t, ps) =>
        !java.util.Arrays.equals(
          Bpe.decodePieceBytes(ps.mkString),
          t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }.count()
    assert(bad === 0)
  }

  test("trainBytes: hand-stepped trajectory, and train->encode round trips") {
    import spark.implicits._
    val docs = (Seq.fill(5)("café latte") ++ Seq.fill(3)("café") ++
      Seq.fill(2)("latte art"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.trainBytes(docs, numMerges = 6).filterNot(_.startsWith("#"))
    assert(merges === Seq("a f", "af Ã", "afÃ ©", "c afÃ©", "a t", "at t"))
    // apply the trained table: café folds to ONE piece, " latte" to 4
    val ranks2 = Bpe.loadMerges(Seq("#version: 0.2") ++ merges)
    assert(Bpe.encodeByteTokens("café", ranks2).toSeq === Seq("cafÃ©"))
    assert(Bpe.encodeByteTokens(" latte", ranks2).toSeq === Seq("Ġ", "l", "att", "e"))
    // the kernel consumes the trained lines directly
    val counted = docs.select(
        TextAnalysis.bpeTokenCountBytes(col("text"),
          Seq("#version: 0.2") ++ merges).as("n"))
      .agg(sum("n")).head.getLong(0)
    // 5×(café=1 + " latte"=4) + 3×(café=1) + 2×(latte=3 + " art"=Ġ,a,r,t=4)
    assert(counted === 5L * 5 + 3 + 2 * 7)
  }

  test("byte-level and codepoint modes agree on pure-ASCII, diverge on CJK") {
    import spark.implicits._
    val df = Seq((1L, "the cat and the dog"), (2L, "我有一个")).toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.bpeTokenCountReal(col("text")).as("cp"),
        TextAnalysis.bpeTokenCountBytes(col("text")).as("by"))
      .orderBy("doc_id").collect()
    assert(df(0).getLong(1) === df(0).getLong(2)) // ASCII: identical
    assert(df(1).getLong(1) === 4L) // codepoint: one symbol per char
    assert(df(1).getLong(2) === 12L) // byte: three symbols per 3-byte char
  }
}
