package graft

import graft.ops.Fusion
import graft.text.Bm25
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval + RRF hybrid fusion. The BM25 gate is a
  * hand-computed score on a four-document corpus (Robertson et al. 1994
  * formulas, "+1" idf variant); fusion gates check the rank-merge
  * semantics hybrid search depends on.
  */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "spark shuffle join spark"),  // dl 4, "spark" twice
    (1L, "join filter scan"),          // dl 3
    (2L, "spark scan"),                // dl 2
    (3L, "window agg agg window"))     // dl 4, no query terms
    .toDF("doc_id", "text")

  test("bm25 matches the hand-computed score and drops term-free docs") {
    val out = Bm25.search(corpus, Seq((7L, "spark join")), k = 10)
      .orderBy("rank").collect()
    // N=4, avgdl=13/4; df(spark)=2, df(join)=2 -> idf = ln(1+2.5/2.5)=ln 2
    val idf = math.log(2.0)
    def tfn(tf: Double, dl: Double) =
      (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl) / 3.25))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = Map( // doc -> rounded score
      0L -> r4(idf * tfn(2, 4) + idf * tfn(1, 4)),
      1L -> r4(idf * tfn(1, 3)),
      2L -> r4(idf * tfn(1, 2)))
    assert(out.map(_.getLong(1)).toSet === exp.keySet) // doc 3 absent
    out.foreach { r =>
      assert(math.abs(r.getDouble(2) - exp(r.getLong(1))) < 1e-9,
        s"doc ${r.getLong(1)}: got ${r.getDouble(2)} want ${exp(r.getLong(1))}")
    }
    // ranks follow descending score
    assert(out.map(_.getLong(3)).toSeq === Seq(1L, 2L, 3L))
    assert(out.sliding(2).forall(p => p(0).getDouble(2) >= p(1).getDouble(2)))
  }

  test("bm25 duplicate query terms count once; k truncates") {
    val once = Bm25.search(corpus, Seq((1L, "spark join")), k = 10).collect()
    val dup = Bm25.search(corpus, Seq((1L, "spark spark join")), k = 10).collect()
    assert(once.map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq ===
      dup.map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq)
    assert(Bm25.search(corpus, Seq((1L, "spark join")), k = 2).count() === 2)
  }

  test("searchDF equals the driver-side search row for row") {
    val qs = Seq((0L, "spark join"), (1L, "scan filter window"))
    val a = Bm25.search(corpus, qs, 10).orderBy("qid", "rank").collect().toSeq
    val b = Bm25.searchDF(corpus, qs.toDF("qid", "qtext"), 10)
      .orderBy("qid", "rank").collect().toSeq
    assert(a === b)
  }

  test("saved inverted index serves the same ranking; pruning reaches the scan; torn build refused") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_spec_ix").toString
    Bm25.buildIndex(corpus, dir, nBuckets = 8)
    val qs = Seq((0L, "spark join"), (1L, "scan filter window"))
    val scan = Bm25.search(corpus, qs, 10).orderBy("qid", "rank").collect().toSeq
    val saved = Bm25.searchSaved(spark, dir, qs, 10).orderBy("qid", "rank").collect().toSeq
    assert(saved === scan)
    // the term filters reach the postings scan: partition pruning on
    // bucket + pushed token predicate
    val plan = Bm25.searchSaved(spark, dir, qs, 10).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("token"),
      s"token predicate not pushed:\n$plan")
    // a torn build (no stats marker) fails loudly
    val torn = java.nio.file.Files.createTempDirectory("bm25_spec_torn").toString
    intercept[IllegalArgumentException] {
      Bm25.searchSaved(spark, torn, qs, 10)
    }
  }

  test("rrf rewards presence in both lists and falls back by id on ties") {
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L)).toDF("qid", "id", "rank")
    val b = Seq((0L, 11L, 1L), (0L, 13L, 2L), (0L, 10L, 3L)).toDF("qid", "id", "rank")
    val out = Fusion.rrf(Seq(a, b), k = 10).orderBy("rank").collect()
    // 11: 1/62+1/61 tops 10: 1/61+1/63; 12 (1/63) and 13 (1/62) single-list
    assert(out.map(_.getLong(1)).toSeq === Seq(11L, 10L, 13L, 12L))
    val s11 = 1.0 / 62 + 1.0 / 61
    assert(math.abs(out(0).getDouble(2) - BigDecimal(s11).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    // exact tie (same single-list rank in mirrored lists) orders by id
    val c = Seq((0L, 20L, 1L)).toDF("qid", "id", "rank")
    val d = Seq((0L, 21L, 1L)).toDF("qid", "id", "rank")
    val tied = Fusion.rrf(Seq(c, d), k = 10).orderBy("rank").collect()
    assert(tied.map(_.getLong(1)).toSeq === Seq(20L, 21L))
  }

  test("phrase search: adjacency from positions, overlapping + repeated terms, positional guard") {
    val docs = Seq(
      (0L, "alpha beta gamma alpha beta"), // "alpha beta" ×2
      (1L, "beta alpha beta gamma"),       // ×1, plus "beta alpha"
      (2L, "alpha gamma beta"),            // terms present, never adjacent
      (3L, "x x x y"))                     // overlapping repeated-term "x x" ×2
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25_phrase_spec").toString
    Bm25.buildIndex(docs, dir, nBuckets = 4, withPositions = true)
    val out = Bm25.phraseSearch(spark, dir,
        Seq((0L, "alpha beta"), (1L, "x x"), (2L, "beta gamma alpha")))
      .orderBy("qid", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), // adjacency only — doc 2 absent
      (1L, 3L, 2L),               // overlapping starts both count
      (2L, 0L, 1L)))              // doc 0 window [beta gamma alpha] at pos 1
    // independent recount of the 3-token phrase over both candidate docs
    assert("alpha beta gamma alpha beta".split(" ").sliding(3)
      .count(_.sameElements(Array("beta", "gamma", "alpha"))) === 1)
    assert("beta alpha beta gamma".split(" ").sliding(3)
      .count(_.sameElements(Array("beta", "gamma", "alpha"))) === 0)
    val tfOnly = java.nio.file.Files.createTempDirectory("bm25_phrase_tf").toString
    Bm25.buildIndex(docs, tfOnly, nBuckets = 4)
    val e = intercept[IllegalArgumentException] {
      Bm25.phraseSearch(spark, tfOnly, Seq((0L, "alpha beta")))
    }
    assert(e.getMessage.contains("positions"))
    // an unseen term and a phrase longer than any doc both yield empty
    // results, not errors (selectivity, not failure)
    assert(Bm25.phraseSearch(spark, dir, Seq((0L, "alpha zzz"))).count() === 0)
    assert(Bm25.phraseSearch(spark, dir,
      Seq((0L, "alpha beta gamma alpha beta gamma alpha"))).count() === 0)
  }

  test("snippets anchor at the first query term, clamp at edges, fall back to the head") {
    val docs = Seq(
      (0L, "a b c d e TARGET f g h i j"), // anchor 5, full ±2 window
      (1L, "target x y z"),               // anchor 0 (case-folded), left clamp
      (2L, "p q r s target"),             // anchor 4, right clamp
      (3L, "no match here at all"))       // fallback head
      .toDF("doc_id", "text")
    val hits = Seq((7L, 0L), (7L, 1L), (7L, 2L), (7L, 3L)).toDF("qid", "doc_id")
    val out = Bm25.snippets(docs, hits, Seq((7L, "TARGET")), window = 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq === Seq(
      (0L, 5L, "d e target f g"),
      (1L, 0L, "target x y"),
      (2L, 4L, "r s target"),
      (3L, 0L, "no match here")))
  }

  test("mmr prefers diversity over marginal relevance; ties break by id; k caps") {
    import graft.ops.Mmr
    // doc 20 ~parallel to doc 10; doc 30 orthogonal. rel favors 10 > 20 > 30.
    val cand = Seq((0L, 10L, 1.0), (0L, 20L, 0.9), (0L, 30L, 0.8)).toDF("qid", "id", "rel")
    val vecs = Seq(
      (10L, Array(1f, 0f)),
      (20L, Array(0.99f, 0.1f)),
      (30L, Array(0f, 1f))).toDF("id", "vector")
    val out = Mmr.rerank(cand, vecs, k = 3, lambda = 0.5)
      .orderBy("mmr_rank").collect()
    // pick 1 = max rel; pick 2: 0.5*0.9 - 0.5*0.995 < 0.5*0.8 - 0.5*0 → 30
    assert(out.map(_.getLong(1)).toSeq === Seq(10L, 30L, 20L))
    assert(out(0).getDouble(4) === 0.0) // first pick shows zero redundancy
    assert(out(2).getDouble(4) > 0.9)   // 20's redundancy to 10
    // k caps the output; duplicate-vector candidates tie-break by id
    assert(Mmr.rerank(cand, vecs, k = 2).count() === 2)
    val tied = Mmr.rerank(
      Seq((0L, 5L, 1.0), (0L, 4L, 1.0)).toDF("qid", "id", "rel"),
      Seq((5L, Array(1f, 0f)), (4L, Array(1f, 0f))).toDF("id", "vector"), k = 2)
      .orderBy("mmr_rank").collect()
    assert(tied.map(_.getLong(1)).toSeq === Seq(4L, 5L))
  }

  test("mmr is invariant to input partition layout") {
    import graft.ops.Mmr
    val cand = (0L until 20L).map(i => (i % 2, i, 1.0 / (1 + i))).toDF("qid", "id", "rel")
    val vecs = (0L until 20L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))).toDF("id", "vector")
    def run(p: Int) = Mmr.rerank(cand.repartition(p), vecs.repartition(p), k = 5)
      .orderBy("qid", "mmr_rank").collect().toSeq
    assert(run(2) === run(9))
  }

  test("weighted fusion normalizes per query, inverts distance lists, sums weights") {
    import graft.ops.Fusion
    // lexical arm: 10 best (score 4), 11 mid (2), 12 worst (0)
    val a = Seq((0L, 10L, 4.0), (0L, 11L, 2.0), (0L, 12L, 0.0)).toDF("qid", "id", "score")
    // vector arm (distance — lower better): 12 best, 11 mid, absent 10
    val b = Seq((0L, 12L, 1.0), (0L, 11L, 2.0), (0L, 13L, 3.0)).toDF("qid", "id", "score")
    val out = Fusion.weighted(Seq((a, 0.6, true), (b, 0.4, false)), k = 10)
      .orderBy("rank").collect()
    // 10: 0.6*1.0 = 0.6; 11: 0.6*0.5 + 0.4*0.5 = 0.5; 12: 0 + 0.4*1.0 = 0.4; 13: 0
    assert(out.map(r => (r.getLong(1), r.getDouble(2))).toSeq ===
      Seq((10L, 0.6), (11L, 0.5), (12L, 0.4), (13L, 0.0)))
    // a constant-score list normalizes to 1.0 for every member
    val c = Seq((0L, 20L, 7.0), (0L, 21L, 7.0)).toDF("qid", "id", "score")
    val flat = Fusion.weighted(Seq((c, 1.0, true)), k = 10).orderBy("rank").collect()
    assert(flat.map(r => (r.getLong(1), r.getDouble(2))).toSeq ===
      Seq((20L, 1.0), (21L, 1.0)))
    intercept[IllegalArgumentException] {
      Fusion.weighted(Seq((a, -0.1, true)), k = 5)
    }
  }

  test("rrf is invariant to input partition layout") {
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L), (1L, 10L, 1L)).toDF("qid", "id", "rank")
    val b = Seq((0L, 11L, 1L), (1L, 12L, 1L)).toDF("qid", "id", "rank")
    val one = Fusion.rrf(Seq(a, b), k = 10).orderBy("qid", "rank").collect().toSeq
    val other = Fusion.rrf(Seq(a.repartition(7), b.repartition(3)), k = 10)
      .orderBy("qid", "rank").collect().toSeq
    assert(one === other)
  }

  test("rank metrics: hand-computed recall/MRR/nDCG, zero-relevance and miss edges") {
    // q0: results ranks 1..3 = ids 10, 1, 2; relevant: 1 (rel 3), 2 (rel 1), 5 (rel 2)
    //   hits at ranks 2, 3; first hit rank 2 -> MRR 0.5; recall 2/3
    //   DCG = (2^3-1)/log2(3) + (2^1-1)/log2(4) = 7/1.58496 + 1/2
    //   IDCG(k=3) = 7/1 + 3/1.58496 + 1/2  (ideal order rel 3,2,1)
    // q1: no relevant docs at all -> all zeros, n_relevant 0
    // q2: relevant exists (id 9, rel 2) but never retrieved -> 0 scores, n_relevant 1
    val results = Seq(
      (0L, 10L, 1), (0L, 1L, 2), (0L, 2L, 3),
      (1L, 4L, 1), (1L, 5L, 2),
      (2L, 7L, 1)).toDF("qid", "id", "rank")
    val relevance = Seq(
      (0L, 1L, 3.0), (0L, 2L, 1.0), (0L, 5L, 2.0),
      (2L, 9L, 2.0)).toDF("qid", "id", "rel")
    val got = graft.ops.RankMetrics.evaluate(results, relevance, k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    def log2(x: Double) = math.log(x) / math.log(2)
    val dcg0 = 7.0 / log2(3) + 1.0 / log2(4)
    val idcg0 = 7.0 / log2(2) + 3.0 / log2(3) + 1.0 / log2(4)
    assert(got(0L).getLong(1) === 3L && got(0L).getLong(2) === 2L)
    assert(math.abs(got(0L).getDouble(3) - 2.0 / 3) < 1e-12)
    assert(math.abs(got(0L).getDouble(4) - 0.5) < 1e-12)
    assert(math.abs(got(0L).getDouble(5) - dcg0 / idcg0) < 1e-12)
    // AP@3 for q0: hits at ranks 2 (cum 1) and 3 (cum 2) ->
    // (1/2 + 2/3) / min(3, 3) = 7/18
    assert(math.abs(got(0L).getDouble(6) - 7.0 / 18) < 1e-12)
    assert(got(1L).getLong(1) === 0L && got(1L).getDouble(3) === 0.0 &&
      got(1L).getDouble(4) === 0.0 && got(1L).getDouble(5) === 0.0 &&
      got(1L).getDouble(6) === 0.0)
    assert(got(2L).getLong(1) === 1L && got(2L).getLong(2) === 0L &&
      got(2L).getDouble(3) === 0.0 && got(2L).getDouble(5) === 0.0 &&
      got(2L).getDouble(6) === 0.0)
    // summary excludes the zero-relevance query by default
    val s = graft.ops.RankMetrics.summarize(
      graft.ops.RankMetrics.evaluate(results, relevance, k = 3)).head()
    assert(s.getLong(0) === 2L)
    assert(math.abs(s.getDouble(1) - (2.0 / 3 + 0.0) / 2) < 1e-12)
    assert(math.abs(s.getDouble(4) - (7.0 / 18 + 0.0) / 2) < 1e-12) // MAP@3
    // perfect retrieval scores 1.0 everywhere
    val perfect = Seq((9L, 1L, 1), (9L, 2L, 2)).toDF("qid", "id", "rank")
    val prel = Seq((9L, 1L, 2.0), (9L, 2L, 1.0)).toDF("qid", "id", "rel")
    val p = graft.ops.RankMetrics.evaluate(perfect, prel, k = 3).head()
    assert(math.abs(p.getDouble(3) - 1.0) < 1e-12 &&
      math.abs(p.getDouble(4) - 1.0) < 1e-12 && math.abs(p.getDouble(5) - 1.0) < 1e-12 &&
      math.abs(p.getDouble(6) - 1.0) < 1e-12)
    // TREC normalization: n_relevant beyond k cannot push a perfect top-k
    // below 1 — denominator is min(n_relevant, k)
    val manyRel = Seq((9L, 1L, 1.0), (9L, 2L, 1.0), (9L, 3L, 1.0), (9L, 4L, 1.0),
      (9L, 5L, 1.0)).toDF("qid", "id", "rel")
    val pm = graft.ops.RankMetrics.evaluate(perfect, manyRel, k = 2).head()
    assert(math.abs(pm.getDouble(6) - 1.0) < 1e-12)
  }

  test("rank metrics: duplicate (qid,id) rows never double-count (recall/nDCG stay <= 1)") {
    // q0 retrieves id 1 twice (ranks 1 and 3) and its single judgment row
    // is itself duplicated — a naive join would fan out 2x2 and report
    // recall 4.0; the deduped result must equal the clean-input answer
    val dupResults = Seq((0L, 1L, 1), (0L, 1L, 3), (0L, 2L, 2)).toDF("qid", "id", "rank")
    val dupRel = Seq((0L, 1L, 2.0), (0L, 1L, 2.0)).toDF("qid", "id", "rel")
    val cleanResults = Seq((0L, 1L, 1), (0L, 2L, 2)).toDF("qid", "id", "rank")
    val cleanRel = Seq((0L, 1L, 2.0)).toDF("qid", "id", "rel")
    val got = graft.ops.RankMetrics.evaluate(dupResults, dupRel, k = 3).head()
    val want = graft.ops.RankMetrics.evaluate(cleanResults, cleanRel, k = 3).head()
    assert(got === want)
    assert(got.getDouble(3) === 1.0 && got.getDouble(4) === 1.0 && got.getDouble(5) === 1.0)
    // conflicting duplicate judgments keep the highest grade
    val graded = Seq((0L, 1L, 1.0), (0L, 1L, 3.0)).toDF("qid", "id", "rel")
    val g = graft.ops.RankMetrics.evaluate(cleanResults, graded, k = 3).head()
    assert(g.getLong(1) === 1L && g.getDouble(5) === 1.0)
  }

  test("rank metrics: distinct ids tied at one rank raise instead of inflating AP/nDCG") {
    // two DIFFERENT relevant docs both at rank 1: rank-label arithmetic
    // would report AP = (2/1 + 2/1) / 2 = 2.0 and nDCG ~1.22 — malformed
    // ranking input must be loud, not silently > 1
    val tied = Seq((0L, 1L, 1), (0L, 2L, 1)).toDF("qid", "id", "rank")
    val rel = Seq((0L, 1L, 1.0), (0L, 2L, 1.0)).toDF("qid", "id", "rel")
    val e = intercept[Exception](
      graft.ops.RankMetrics.evaluate(tied, rel, k = 3).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("share rank")), messages(e).mkString(" | "))
    // the same doc at the same rank twice is mere duplication (deduped,
    // no error) — only distinct ids sharing a rank are malformed
    val dupSame = Seq((0L, 1L, 1), (0L, 1L, 1), (0L, 2L, 2)).toDF("qid", "id", "rank")
    val ok = graft.ops.RankMetrics.evaluate(dupSame, rel, k = 3).head()
    assert(ok.getDouble(3) === 1.0 && ok.getDouble(6) === 1.0)
  }
}
