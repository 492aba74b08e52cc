package graft

import graft.text.WordPiece

class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  // corpus: ab x4, abc x2, cd x1 — hand-derived trajectory:
  //   round 1: pairs (a,##b):6 score 6/36, (##b,##c):2 score 2/12,
  //            (c,##d):1 score 1/(1*1)=1.0 → the rare-but-exclusive pair
  //            wins (THE WordPiece-vs-BPE distinction; BPE would merge
  //            (a,##b) first) → "cd"
  //   round 2: (a,##b) 6/36 ties (##b,##c) 2/12 at 1/6 → lex smaller
  //            ("##b","##c") merges → "##bc"
  //   round 3: (a,##b):4 4/24 ties (a,##bc):2 2/12 at 1/6 → right "##b" <
  //            "##bc" → "ab"
  //   round 4: (a,##bc):2 score 2/(2*2)=0.5 → "abc"
  private def corpus =
    (Seq.fill(4)("ab") ++ Seq.fill(2)("abc") ++ Seq.fill(1)("cd"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("train follows the likelihood-scored merge trajectory") {
    val m = WordPiece.train(corpus, numMerges = 4, minPairCount = 1L)
    assert(m.merges.map(t => (t._1, t._2)) ===
      Seq(("c", "##d"), ("##b", "##c"), ("a", "##b"), ("a", "##bc")))
    val scores = m.merges.map(_._3)
    assert(math.abs(scores(0) - 1.0) < 1e-15)
    assert(math.abs(scores(1) - 1.0 / 6.0) < 1e-15)
    assert(math.abs(scores(2) - 1.0 / 6.0) < 1e-15)
    assert(math.abs(scores(3) - 0.5) < 1e-15)
    assert(m.vocab === Seq("##b", "##c", "##d", "a", "c", "cd", "##bc", "ab", "abc"))
  }

  test("minPairCount is an eligibility floor, not an early stop") {
    val m = WordPiece.train(corpus, numMerges = 10, minPairCount = 2L)
    // (c,##d) has count 1 → EXCLUDED each round (it would be the
    // likelihood-best pair — a stop there would truncate training for
    // the whole corpus on one singleton); the eligible pairs merge to
    // exhaustion: (##b,##c) and (a,##b) tie at 1/6 → lex; then (a,##bc)
    // at 0.5; then only the ineligible singleton remains → done
    assert(m.merges.map(t => (t._1, t._2)) ===
      Seq(("##b", "##c"), ("a", "##b"), ("a", "##bc")))
  }

  test("position-0 probes never match continuation-marked vocab entries") {
    // a pretoken literally starting with "##" must not be consumed as a
    // continuation piece: reconstruction would strip the marker and lose
    // text; the walk falls to shorter prefixes or whole-word [UNK]
    val v = Set("#", "##a", "a", "##b")
    // "##a" is IN the vocab as a continuation; the raw text "##a" at
    // position 0 must NOT match it: the walk takes the "#" alphabet
    // piece, then "#a" has no continuation match ("###a"/"###" absent)
    // → whole-word [UNK] — reconstruction stays exact via the fallback
    assert(WordPiece.encodePieces("##a", v).toSeq === Seq(WordPiece.Unk))
    assert(WordPiece.countPieces("##a", v) === 1)
    // an ordinary word-initial '#' still encodes through the alphabet
    assert(WordPiece.encodePieces("#a", v).toSeq === Seq("#", "##a"))
    assert(WordPiece.countPieces("#a", v) === 2)
  }

  test("greedy longest-match-first encode with whole-word UNK") {
    val m = WordPiece.train(corpus, numMerges = 4, minPairCount = 1L)
    val v = m.pieceSet
    assert(WordPiece.encodePieces("abcd", v).toSeq === Seq("abc", "##d"))
    assert(WordPiece.encodePieces("cdcd", v).toSeq === Seq("cd", "##c", "##d"))
    assert(WordPiece.encodePieces("ba", v).toSeq === Seq(WordPiece.Unk))
    assert(WordPiece.encodePieces("", v).isEmpty)
    // count-only walk agrees with the piece walk everywhere
    for (w <- Seq("abcd", "cdcd", "ba", "", "ab", "abc", "aaab", "cdc"))
      assert(WordPiece.countPieces(w, v) === WordPiece.encodePieces(w, v).length, w)
  }

  test("pieces reconstruct the pretoken exactly when no UNK") {
    val m = WordPiece.train(corpus, numMerges = 4, minPairCount = 1L)
    val v = m.pieceSet
    for (w <- Seq("abcd", "cdcd", "ab", "abc", "cd", "accd")) {
      val p = WordPiece.encodePieces(w, v)
      if (!p.contains(WordPiece.Unk))
        assert(p.map(_.stripPrefix("##")).mkString === w, w)
    }
  }

  test("countTokens runs distributed with the broadcast vocab") {
    val m = WordPiece.train(corpus, numMerges = 4, minPairCount = 1L)
    val planted = Seq((1L, "ab"), (2L, "abcd"), (3L, "ba"), (4L, "cdcd"),
      (5L, ""), (6L, "ab abc")).toDF("doc_id", "text")
    val got = WordPiece.countTokens(planted, m)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // "ab abc" pretokenizes to ["ab", " abc"]; " abc" starts with a space
    // the training alphabet lacks → whole-pretoken UNK → 1 + 1
    assert(got === Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 3L), (5L, 0L), (6L, 2L)))
  }
}
