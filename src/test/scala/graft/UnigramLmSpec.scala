package graft

import graft.text.UnigramLm
import org.apache.spark.sql.functions._

/** Unigram-LM trainer: the hand-derived EM fixture (independently
  * replayed in Python during authoring), layout-invariance of the
  * distributed E-step, vocabulary invariants on real text, Viterbi
  * tie-break/unk semantics, and loud failures.
  */
class UnigramLmSpec extends SparkTestBase {

  private def fixtureDocs = {
    import spark.implicits._
    Seq.fill(4)("aab").zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("hand-derived fixture: EM -> prune -> EM trajectory lands on the derived constants") {
    val v = UnigramLm.train(fixtureDocs, vocabSize = 4, maxPieceLen = 3,
      seedSize = 100, emIters = 1, pruneRate = 0.25).toMap
    assert(v.keySet === Set("a", "b", "ab", "aab"))
    // full-precision values from the independent Python replay of the
    // same double arithmetic (forward-backward in log space)
    val expected = Map(
      "a" -> -2.3073044780788967,
      "aab" -> -0.2035355138941855,
      "ab" -> -2.6631243556978954,
      "b" -> -4.206422465627451)
    expected.foreach { case (p, lp) =>
      assert(math.abs(v(p) - lp) < 1e-9, s"piece $p: ${v(p)} vs $lp")
    }
  }

  test("layout invariance: identical logProbs under different corpus partitioning") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 120)
    val a = UnigramLm.train(docs.repartition(1), vocabSize = 80,
      maxPieceLen = 4, seedSize = 200, emIters = 1, pruneRate = 0.3)
    val b = UnigramLm.train(docs.repartition(8), vocabSize = 80,
      maxPieceLen = 4, seedSize = 200, emIters = 1, pruneRate = 0.3)
    assert(a === b, "E-step reduction must be byte-identical across layouts")
  }

  test("vocabulary invariants on real text: size respected, singles kept, probs normalized") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(200)
    val v = UnigramLm.train(docs, vocabSize = 150, maxPieceLen = 4,
      seedSize = 400, emIters = 1, pruneRate = 0.25)
    assert(v.size <= math.max(150, 1))
    assert(v.forall { case (_, lp) => lp.isFinite && lp <= 0.0 })
    val mass = v.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(mass - 1.0) < 1e-9, s"probability mass $mass != 1")
    // every single char present in the vocab's own pieces is retained
    val chars = v.map(_._1).filter(_.length == 1).toSet
    assert(v.forall { case (p, _) => p.forall(c => chars.contains(c.toString)) },
      "multi-char pieces must be spelled by retained single chars")
    assert(v.map(_._1) === v.map(_._1).sorted, "output sorted by piece")
  }

  test("viterbi: max-prob segmentation, tie-breaks, unk floor, empty") {
    val v = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -1.5, "abc" -> -4.0)
    // [ab] (-1.5) beats [a, b] (-2.0)
    assert(UnigramLm.viterbiCount("ab", v, maxPieceLen = 3) === 1)
    // "abc": [ab, c?] c unknown => -1.5 - 20; [abc] -4.0 wins
    assert(UnigramLm.viterbiCount("abc", v, maxPieceLen = 3) === 1)
    // exact score tie: [ab, ab] (-3.0) vs [a, b, ab]... (-3.5+) — fewer
    // pieces wins where scores tie; here [ab, ab] also has best score
    assert(UnigramLm.viterbiCount("abab", v, maxPieceLen = 3) === 2)
    // unknown-only text: one unk piece per char
    assert(UnigramLm.viterbiCount("xyz", v, maxPieceLen = 3) === 3)
    assert(UnigramLm.viterbiCount("", v) === 0)
  }

  test("countTokens: pretokenization, space marker, null text") {
    import spark.implicits._
    val vocab = Seq(("a", -1.0), ("b", -1.0), ("ab", -1.5), ("▁", -2.0),
      ("▁ab", -1.8))
    val docs = Seq((1L, "ab ab"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val got = UnigramLm.countTokens(docs, vocab, maxPieceLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // "ab ab" -> pretokens "ab", "▁ab": [ab] + [▁ab] = 2
    assert(got === Map(1L -> 2L, 2L -> 0L, 3L -> 0L))
  }

  test("viterbiPieces: partition property and count agreement on arbitrary words") {
    val vocab = Map("a" -> -1.0, "b" -> -1.2, "ab" -> -1.5, "ba" -> -1.4,
      "aba" -> -3.0, "▁" -> -2.0, "▁a" -> -1.7)
    val rnd = new scala.util.Random(3)
    val alphabet = "ab▁xy"
    (0 until 500).foreach { _ =>
      val w = Array.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val pieces = UnigramLm.viterbiPieces(w, vocab, maxPieceLen = 3)
      assert(pieces.mkString === w, s"pieces must partition '$w'")
      assert(pieces.length === UnigramLm.viterbiCount(w, vocab, maxPieceLen = 3),
        s"piece path disagrees with count path on '$w'")
    }
  }

  test("loud failures: empty corpus, vocabSize below the single-char floor") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      UnigramLm.train(empty, vocabSize = 10)
    }
    intercept[IllegalArgumentException] {
      // fixture has 2 distinct chars; vocabSize 1 < 2 must refuse
      UnigramLm.train(fixtureDocs, vocabSize = 1, maxPieceLen = 3, seedSize = 100)
    }
  }
}
