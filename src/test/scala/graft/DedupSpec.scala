package graft

import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val d = docs((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val g = Dedup.exactGroups(d).collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(g.toSeq === Seq((1L, 2L), (3L, 1L)))
  }

  test("shingles are distinct token 3-grams with short-doc fallback") {
    val d = docs((1L, "a b c d"), (2L, "x y"))
    val sh = d.orderBy("doc_id").select(Dedup.shingles($"text")).as[Seq[String]].collect()
    assert(sh(0).toSet === Set("a b c", "b c d"))
    assert(sh(1) === Seq("x y"))
  }

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    val base = (0L until 50L).map(i => (i, s"tok${i}a tok${i}b tok${i}c tok${i}d tok${i}e tok${i}f tok${i}g tok${i}h tok${i}i tok${i}j"))
    val nearDups = (0L until 10L).map(i => (i + 1000L, s"zz ${base(i.toInt)._2}"))
    val pairs = Dedup.minhashLshPairs(docs(base ++ nearDups: _*), threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === (0L until 10L).map(i => (i, i + 1000L)).toSet)
  }

  test("incremental pairs match new-vs-corpus only, never within a side") {
    val corpus = (0L until 30L).map(i =>
      (i, s"c${i}a c${i}b c${i}c c${i}d c${i}e c${i}f c${i}g c${i}h c${i}i c${i}j"))
    // new batch: near-dups of corpus docs 0-4 AND of EACH OTHER pairwise
    // (1000/2000 share a base) — within-batch pairs must not appear
    val newBatch = (0L until 5L).flatMap { i =>
      Seq((i + 1000L, s"zz ${corpus(i.toInt)._2}"), (i + 2000L, s"yy ${corpus(i.toInt)._2}"))
    }
    val pairs = Dedup.minhashLshPairsAgainst(
        docs(newBatch: _*), docs(corpus: _*), threshold = 0.5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(pairs === (0L until 5L).flatMap(i => Seq((i + 1000L, i), (i + 2000L, i))).toSet)
  }

  test("incremental star guard caps oversized corpus buckets at one representative") {
    val boiler = "same boilerplate text repeated across the whole corpus here now"
    val corpus = (0L until 8L).map(i => (i, boiler))
    val newBatch = Seq((100L, boiler))
    val capped = Dedup.minhashLshPairsAgainst(
        docs(newBatch: _*), docs(corpus: _*), threshold = 0.9, maxBucketSize = 4)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    // every oversized bucket collapses to the min-id corpus representative
    assert(capped === Set((100L, 0L)))
    val full = Dedup.minhashLshPairsAgainst(
        docs(newBatch: _*), docs(corpus: _*), threshold = 0.9, maxBucketSize = 0)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(full === (0L until 8L).map(i => (100L, i)).toSet)
  }

  test("edit-verified pairs keep high-edit-sim candidates and cut low ones") {
    // ten 10-token docs; near-dups prepend one token ("zz ") — high Jaccard
    // for all, but edit similarity scales with doc length: make half the
    // docs short enough that a 3-char prefix fails the 0.9 gate.
    val longBody = (0 until 20).map(j => s"w$j").mkString(" ")   // 59 chars
    val shortBody = (0 until 4).map(j => s"s$j").mkString(" ")   // 11 chars
    val base = Seq((1L, longBody), (2L, shortBody))
    val dups = Seq((1001L, "zz " + longBody), (1002L, "zz " + shortBody))
    val pairs = Dedup.editVerifiedPairs(docs(base ++ dups: _*),
        jaccardFloor = 0.3, minEditSim = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // long pair: 1 - 3/62 = 0.952 passes; short pair: 1 - 3/14 = 0.786 cut
    assert(pairs === Set((1L, 1001L)))
    // edit_sim is the exact integer ratio
    val sim = Dedup.editVerifiedPairs(docs(base ++ dups: _*),
        jaccardFloor = 0.3, minEditSim = 0.5)
      .filter($"doc_a" === 2L).select("edit_sim").as[Double].head()
    assert(math.abs(sim - (1.0 - 3.0 / 14.0)) < 1e-12)
  }

  test("compositional band hashes equal the fused text kernel") {
    val d = docs((1L, "alpha beta gamma delta epsilon zeta eta"), (2L, "one two three four five"))
    val fused = d.orderBy("doc_id").select(graft.internal.SqlBridge.column(
        graft.functions.ShingleBandHashes(graft.internal.SqlBridge.expression($"text"), 3, 8, 4)))
      .as[Seq[Long]].collect()
    val composed = d.orderBy("doc_id")
      .select(Dedup.bandHashesFromShingles(Dedup.shingles($"text"), 8, 4))
      .as[Seq[Long]].collect()
    assert(fused.toSeq === composed.toSeq)
  }

  test("minhash signature is stable and length numHashes") {
    val d = docs((1L, "one two three four five"))
    val sig = d.select(Dedup.minhashSignature(Dedup.shingles($"text"), 32)).as[Seq[Long]].head()
    assert(sig.length === 32)
    val sig2 = d.select(Dedup.minhashSignature(Dedup.shingles($"text"), 32)).as[Seq[Long]].head()
    assert(sig === sig2)
  }

  test("embedding near-dup LSH finds identical vectors, excludes distant ones") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f, 0f)),   // dup of 1
      (3L, Array(0f, 1f, 0f, 0f)),   // orthogonal
      (4L, Array(-1f, 0f, 0f, 0f)))  // opposite
    val df = vecs.toDF("id", "vector")
    val planes = Dedup.randomPlanes(8, 4, seed = 3)
    val pairs = Dedup.embeddingNearDupPairs(df, planes, threshold = 0.1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("multi-probe LSH recovers hamming-1 pairs that exact probing misses") {
    // axis planes: signature bit p = sign of v[p]
    val planes = Array(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    val vecs = Seq(
      (1L, Array(1f, 1f, 1f, 1f)),   // sig 1111
      (2L, Array(1f, 1f, 1f, -1f)))  // sig 0111 — hamming 1, cos dist 0.5
    val df = vecs.toDF("id", "vector")
    val exact = Dedup.embeddingNearDupPairs(df, planes, threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(exact.isEmpty, "exact probing should miss the straddling pair")
    val probed = Dedup.embeddingNearDupPairs(df, planes, threshold = 0.6, multiProbe = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(probed === Set((1L, 2L)))
  }

  test("probe-sequence enumeration: margin-ordered subsets, lazily, exact first") {
    // margins: bit 2 smallest (0.1), then bit 0 (0.2), then bit 1 (5.0)
    val sigs = Dedup.probeSequence(sig = 0L, margins = Array(0.2, 5.0, 0.1), probes = 5)
    // score order: {} (0) < {2} (.1) < {0} (.2) < {2,0} (.3) < {1} (5) …
    assert(sigs.toSeq === Seq(0L, 4L, 1L, 5L, 2L))
    // a probe budget of 1 is just the exact signature
    assert(Dedup.probeSequence(7L, Array(1.0, 2.0, 3.0), 1).toSeq === Seq(7L))
    // the full enumeration covers all 2^n subsets without repeats
    val all = Dedup.probeSequence(0L, Array(0.4, 0.3, 0.2, 0.1), 16)
    assert(all.length === 16 && all.toSet.size === 16)
  }

  test("probe-sequence LSH catches a 2-plane straddle that hamming-1 misses (Lv et al. 2007)") {
    // axis planes; a and b sit 0.01 from planes 0 AND 1 on opposite sides:
    // signatures differ in two bits, so hamming-1 probing (flip ONE bit of
    // the left side) can never reach the partner bucket — the probe
    // sequence flips the two smallest-margin bits as its 4th probe
    val planes = Array(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    val vecs = Seq(
      (1L, Array(0.01f, 0.01f, 1f, 1f)),
      (2L, Array(-0.01f, -0.01f, 1f, 1f))) // cos dist ≈ 2e-4
    val df = vecs.toDF("id", "vector")
    val h1 = Dedup.embeddingNearDupPairs(df, planes, threshold = 0.1, multiProbe = true)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(h1.isEmpty, "hamming-1 should miss a 2-plane straddle")
    val seq4 = Dedup.embeddingNearDupPairs(df, planes, threshold = 0.1, probes = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(seq4 === Set((1L, 2L)),
      "a 4-probe sequence must reach the two-smallest-margin flip")
    // and the sequence still finds everything hamming-1 finds: exact
    // copies share the exact bucket at any probe budget
    val copies = Seq((1L, Array(1f, 2f, 3f, 4f)), (2L, Array(1f, 2f, 3f, 4f)))
      .toDF("id", "vector")
    val c = Dedup.embeddingNearDupPairs(copies, planes, threshold = 0.01, probes = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(c === Set((1L, 2L)))
  }

  test("LSH skew guard: a 10k-doc boilerplate bucket yields n-1 star pairs, not C(n,2)") {
    val n = 10000
    // identical text: every band bucket holds all n docs — the C(n,2)
    // formulation would emit ~50M candidate pairs; the star guard must
    // bound it at n-1 (all docs still reachable from the representative)
    val d = (0L until n.toLong).map(i => (i, "common boilerplate header repeated across the entire corpus"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(d, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.length === n - 1, s"expected ${n - 1} star pairs, got ${pairs.length}")
    assert(pairs.forall(_._1 === 0L), "all pairs must connect through the min-id representative")
    assert(pairs.map(_._2).toSet === (1L until n.toLong).toSet)
  }

  test("LSH skew guard leaves sub-cap buckets on exact all-pairs semantics") {
    // 5 identical docs, cap 4: bucket size 5 > 4 → star (4 pairs);
    // raising the cap restores all-pairs (10 pairs)
    val d = (0L until 5L).map(i => (i, "tiny shared text body here")).toDF("doc_id", "text")
    val star = Dedup.minhashLshPairs(d, threshold = 0.8, maxBucketSize = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(star.length === 4 && star.forall(_._1 === 0L))
    val full = Dedup.minhashLshPairs(d, threshold = 0.8, maxBucketSize = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(full.length === 10)
  }

  test("catalog planes: planted near-dup straddling ONE hyperplane — exact probe misses, shipped multi-probe finds") {
    // the exact planes the neardup_embedding catalog query uses
    val planes = Dedup.randomPlanes(nbits = 16, dim = 64, seed = 7)
    val eps = 0.01

    def dot(a: Array[Double], p: Array[Float]): Double =
      a.indices.map(i => a(i) * p(i)).sum

    // find a base vector whose signature flips in EXACTLY one bit when
    // reflected to -eps margin on its closest plane
    val planted = (0 until 100).view.map { seed =>
      val rnd = new scala.util.Random(seed)
      val u = Array.fill(64)(rnd.nextDouble() - 0.5)
      val dots = planes.map(p => dot(u, p))
      val t = dots.indices.minBy(i => math.abs(dots(i)))
      // v1: margin +eps on plane t; v2: margin -eps (reflect along plane t)
      val v1 = u.indices.map(i => u(i) - (dots(t) - eps) / 64.0 * planes(t)(i)).toArray
      val v2 = v1.indices.map(i => v1(i) - 2 * eps / 64.0 * planes(t)(i)).toArray
      val sig1 = planes.map(p => dot(v1, p) >= 0)
      val sig2 = planes.map(p => dot(v2, p) >= 0)
      val flipped = sig1.indices.count(i => sig1(i) != sig2(i))
      (v1.map(_.toFloat), v2.map(_.toFloat), flipped, t, sig1, sig2)
    }.find { case (v1, v2, flipped, t, sig1, sig2) =>
      flipped == 1 && sig1(t) != sig2(t) &&
        // float-side margins must also be sign-stable on every other plane
        planes.indices.forall { p =>
          val d1 = dot(v1.map(_.toDouble), planes(p))
          val d2 = dot(v2.map(_.toDouble), planes(p))
          if (p == t) d1 >= 0 != d2 >= 0 else math.min(math.abs(d1), math.abs(d2)) > 1e-3
        }
    }
    assert(planted.isDefined, "no seed produced a clean single-plane straddle")
    val (v1, v2, _, _, _, _) = planted.get

    // the pair is a true near-dup: cosine distance well under the threshold
    def cosDist(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val d = ad.indices.map(i => ad(i) * bd(i)).sum
      math.abs(1.0 - d / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum)))
    }
    assert(cosDist(v1, v2) <= 0.1, s"planted pair not a near-dup: ${cosDist(v1, v2)}")

    val df = Seq((1L, v1), (2L, v2)).toDF("id", "vector")
    val exact = Dedup.embeddingNearDupPairs(df, planes, threshold = 0.1)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(exact.isEmpty, "exact probing silently misses the straddling near-dup")
    val probed = Dedup.embeddingNearDupPairs(df, planes, threshold = 0.1, multiProbe = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(probed === Set((1L, 2L)), "shipped multi-probe config must find it")
  }

  test("connected components resolve pairs to min-id groups across chains") {
    // component {1,2,3,4,5} as a pure chain (diameter 4 — forces several
    // propagation rounds), component {10,11}, and a triangle {20,21,22}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components on an empty pair set return empty (clean corpus, not an error)") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).collect().isEmpty)
    // and curate survives a corpus with no near-dups at all
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different words describing engine internals instead"))
      .toDF("doc_id", "text")
    val emb = Seq((1L, Array.fill(4)(1f)), (2L, Array.fill(4)(1f))).toDF("vec_id", "embedding")
    graft.pipeline.Curation.curate(docs, emb, minQuality = 0.0).collect() // must not throw
  }

  test("connected components match driver union-find on random graphs (chains, forests, multi-edges)") {
    val rnd = new scala.util.Random(42)
    (1 to 6).foreach { trial =>
      val nNodes = 2 + rnd.nextInt(40)
      val edges = Seq.fill(1 + rnd.nextInt(50))(
          (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // union-find reference: max root points at min root, so every
        // component's final root is its minimum member id
        val parent = Array.tabulate(nNodes)(identity)
        def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val present = edges.flatMap(t => Seq(t._1, t._2)).distinct
        val expected = present.map(id => id -> find(id.toInt).toLong).toMap
        val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
          .as[(Long, Long)].collect().toMap
        assert(got === expected, s"trial $trial: edges=$edges")
      }
    }
  }

  test("13-gram decontamination fires on a 13-token contiguous quote, not on 12") {
    val bench = Seq((1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november"))
      .toDF("bench_id", "text")
    val docs = Seq(
      // 13 contiguous benchmark tokens inside unique framing -> contaminated
      (10L, "intro words alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike outro"),
      // only 12 contiguous tokens -> clean under the 13-gram criterion
      (11L, "intro words alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima outro"),
      // all 14 tokens but SHUFFLED (no contiguous 13-run) -> clean
      (12L, "november alpha charlie bravo echo delta golf foxtrot india hotel juliet mike kilo lima"))
      .toDF("doc_id", "text")
    val hits = Dedup.contaminationPairs(docs, bench, minShared = 1, n = 13)
      .select("doc_id").as[Long].collect().toSet
    assert(hits === Set(10L))
  }

  test("13-gram decontamination degenerate case: docs under 13 tokens match on whole text only") {
    val bench = Seq((1L, "alpha bravo charlie delta echo")).toDF("bench_id", "text")
    val docs = Seq(
      (10L, "alpha bravo charlie delta echo"),        // identical short doc -> one degenerate shingle match
      (11L, "alpha bravo charlie delta"),             // subset, different whole text -> clean
      (12L, "alpha bravo charlie delta echo foxtrot") // superset: its 13-gram shingle set is the whole
                                                      // 6-token text, bench's is the 5-token text -> clean
    ).toDF("doc_id", "text")
    val hits = Dedup.contaminationPairs(docs, bench, minShared = 1, n = 13)
      .select("doc_id").as[Long].collect().toSet
    assert(hits === Set(10L))
  }

  test("connected components converge on a 10k-node path graph (pointer-doubling rounds)") {
    // diameter 9999 — one-hop-per-round propagation would exhaust
    // maxIter=100 and throw; the shortcut rounds must converge in
    // ~log2(10k) + shortcutAfter rounds
    val n = 10000L
    val path = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(path).as[(Long, Long)].collect()
    assert(got.length === n)
    assert(got.forall(_._2 === 0L), "path component split: some node missed the global min label")
  }

  test("connected components + keep-min filter drops exactly the non-representatives") {
    val pairs = Seq((3L, 7L), (7L, 9L), (100L, 101L)).toDF("doc_a", "doc_b")
    val drops = Dedup.connectedComponents(pairs)
      .filter($"id" =!= $"group_id").select("id").as[Long].collect().toSet
    assert(drops === Set(7L, 9L, 101L))
  }

  test("BPE-style pretoken count: contractions split, CJK runs group, digits separate") {
    val d = docs(
      (1L, "I don't think so"),          // I / _don / 't / _think / _so
      (2L, "abc123 def"),                // abc / 123 / _def
      (3L, "我有一个想法"),               // one CJK letter-run
      (4L, ""))
    val counts = d.orderBy("doc_id")
      .select(TextAnalysis.bpeTokenCount($"text")).as[Long].collect()
    assert(counts.toSeq === Seq(5L, 3L, 1L, 0L))
  }

  test("contamination pairs flag quoted benchmark spans, skip clean docs") {
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")).toDF("bench_id", "text")
    val corpus = docs(
      // quotes 10 consecutive tokens -> 8 shared 3-grams
      (1L, "intro words alpha beta gamma delta epsilon zeta eta theta iota kappa outro"),
      // shares only 2 tokens in sequence -> 0 shared 3-grams
      (2L, "alpha beta unrelated content entirely different from the benchmark suite"),
      (3L, "nothing in common with anything at all here truly"))
    val hits = Dedup.contaminationPairs(corpus, bench, minShared = 8)
      .select("doc_id", "bench_id", "n_shared").as[(Long, Long, Long)].collect()
    assert(hits.toSeq === Seq((1L, 100L, 8L)))
    // lowering the floor surfaces nothing new from docs 2/3 (0 shared 3-grams)
    val loose = Dedup.contaminationPairs(corpus, bench, minShared = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(loose === Set(1L))
  }

  test("contamination rate: per-eval-doc fraction of n-grams seen in training") {
    val corpus = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven"),
      (3L, "unrelated corpus filler text goes here"))
    val bench = Seq(
      // 8 tokens quoted from doc 1 + 2 held-out -> 8 3-grams, 6 interior
      // match (quoted 3-grams), 2 crossing the suffix don't
      (100L, "alpha beta gamma delta epsilon zeta eta theta QQQ WWW"),
      // nothing shared -> rate 0
      (200L, "totally novel eval question nobody has seen"),
      // exact substring of doc 2 -> every 3-gram matches -> rate 1
      (300L, "two three four five six"),
      // short doc (< n tokens): whole-text fallback shingle, unseen -> 0/1
      (400L, "tiny one")).toDF("bench_id", "text")
    val got = Dedup.contaminationRate(corpus, bench, n = 3)
      .select("bench_id", "n_shingles", "n_matched", "rate")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (100L, 8L, 6L, 0.75), (200L, 5L, 0L, 0.0),
      (300L, 3L, 3L, 1.0), (400L, 1L, 0L, 0.0)))
  }

  test("repetition ratio: looped text scores high, unique text zero, short docs zero") {
    val d = docs(
      (1L, "a b c d e f"),             // 4 distinct 3-grams of 4 -> 0
      (2L, "a b c a b c a b c"),       // 7 3-grams, 3 distinct -> 4/7
      (3L, "x y"),                     // short-doc fallback -> 0
      (4L, "w w w w w w w w w w"))     // 8 3-grams, 1 distinct -> 7/8
    val r = d.orderBy("doc_id")
      .select(TextAnalysis.repetitionRatio($"text")).as[Double].collect()
    assert(r(0) === 0.0)
    assert(math.abs(r(1) - 4.0 / 7) < 1e-12)
    assert(r(2) === 0.0)
    assert(math.abs(r(3) - 7.0 / 8) < 1e-12)
  }

  test("character-class ratios count ASCII classes over raw length") {
    val d = docs((1L, "Ab1 Cd!")) // len 7: 2 upper, 1 digit, 4 alpha
    val cols = TextAnalysis.charClassRatios($"text").map { case (n, c) => c.as(n) }
    val row = d.select(cols: _*).head()
    assert(math.abs(row.getDouble(0) - 2.0 / 7) < 1e-12)
    assert(math.abs(row.getDouble(1) - 1.0 / 7) < 1e-12)
    assert(math.abs(row.getDouble(2) - 4.0 / 7) < 1e-12)
  }

  test("BPE training: learned merges follow pair frequencies with the space marker; " +
    "composes with the counting kernel; deterministic across layouts") {
    // "aa aa aa" pretokenizes (GPT-2 style, leading space attaches) to
    // "aa", " aa", " aa": pair (a,a) counts 3, (Ġ,a) counts 2 — so the
    // learned sequence is a+a, then Ġ+aa
    val tiny = Seq((0L, "aa aa aa")).toDF("doc_id", "text")
    val m1 = graft.text.Bpe.train(tiny, numMerges = 5)
    assert(m1.filterNot(_.startsWith("#")) === Seq("a a", "Ġ aa"))

    // the paper's corpus; trained table feeds countTokens directly:
    // low=1 sym, lower=3, newest=4, widest=4 after the 4 merges
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = graft.text.Bpe.train(docs, numMerges = 4)
    val ranks = graft.text.Bpe.loadMerges(merges)
    assert(graft.text.Bpe.countTokens("low", ranks) === 1)
    assert(graft.text.Bpe.countTokens("lower", ranks) === 3)
    assert(graft.text.Bpe.countTokens("newest", ranks) === 4)
    assert(graft.text.Bpe.countTokens("widest", ranks) === 4)
    // the pieces behind those counts: merged symbols, reconstructing the input
    assert(graft.text.Bpe.encodeTokens("lower", ranks).toSeq === Seq("low", "e", "r"))
    assert(graft.text.Bpe.encodeTokens("newest", ranks).mkString === "newest")
    // Ġ convention through the column API: a mid-text pretoken carries
    // its leading space as Ġ and the round trip restores it
    val pieces = Seq((1L, "the cat")).toDF("doc_id", "text")
      .select(TextAnalysis.bpeTokensReal(col("text")).as("p"))
      .as[Seq[String]].head()
    assert(pieces.exists(_.startsWith("Ġ")))
    assert(pieces.mkString.replace('Ġ', ' ') === "the cat")

    // layout invariance: the frequency aggregation is exact and the cap
    // ordering total, so any partitioning trains the same table
    val m7 = graft.text.Bpe.train(docs.repartition(7), numMerges = 4)
    assert(m7 === merges)

    // minFrequency early-stop: a singleton corpus cannot reach 10 merges
    val single = Seq((0L, "xyz")).toDF("doc_id", "text")
    val ms = graft.text.Bpe.train(single, numMerges = 10, minFrequency = 2)
    assert(ms.filterNot(_.startsWith("#")).isEmpty)
  }

  test("real BPE: merge loop follows rank order, Ġ space marker, merges.txt format") {
    val ranks = graft.text.Bpe.loadMerges(graft.text.Bpe.DemoMerges)
    // header line consumed no rank: first rule is rank 0
    assert(ranks(("t", "h")) === 0)
    // "the": (t,h) then (th,e) -> one token
    assert(graft.text.Bpe.countTokens("the", ranks) === 1)
    // " the": (t,h) wins over (Ġ,t); then (th,e); then (Ġ,the) -> one token
    assert(graft.text.Bpe.countTokens(" the", ranks) === 1)
    // " and" chains through (a,n),(an,d),(Ġ,and) -> one token
    assert(graft.text.Bpe.countTokens(" and", ranks) === 1)
    // " don" has no chain for d: Ġ strands -> three tokens
    assert(graft.text.Bpe.countTokens(" don", ranks) === 3)
    // no applicable merges: one symbol per character
    assert(graft.text.Bpe.countTokens("xyz", ranks) === 3)
    assert(graft.text.Bpe.countTokens("我有", ranks) === 2)
    assert(graft.text.Bpe.countTokens("", ranks) === 0)
    // all-occurrence merging is non-overlapping left-to-right
    val aa = graft.text.Bpe.loadMerges(Seq("a a"))
    assert(graft.text.Bpe.countTokens("aaa", aa) === 2) // [aa, a]
    assert(graft.text.Bpe.countTokens("aaaa", aa) === 2) // [aa, aa]; (aa,aa) unranked
  }

  test("real BPE counts respect corpus-scale bounds: pretokens <= bpe <= characters") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val checked = docs.select(
        TextAnalysis.bpeTokenCountReal($"text").as("bpe"),
        TextAnalysis.bpeTokenCount($"text").as("pretok"),
        length($"text").cast("long").as("chars"))
      .filter(!($"bpe" >= $"pretok" && $"bpe" <= $"chars"))
      .count()
    assert(checked === 0L, "BPE count out of [pretokens, text length] bounds for some doc")
  }

  test("gopher signals: mean word length, symbol ratio, bullet/ellipsis line fractions") {
    val d = docs(
      (1L, "- buy gold\n- buy silver\n- buy bronze\nnormal closing line"), // 3 of 4 lines bullets
      (2L, "the story continues...\nand then it ends...\nfinally done"),   // 2 of 3 lines ellipsis
      (3L, "## x #y"), // 3 hashes over 3 tokens
      (4L, "aa bbbb"))  // mean token length 3
    val cols = TextAnalysis.gopherSignals($"text").map { case (n, c) => c.as(n) }
    val rows = d.orderBy("doc_id").select(cols: _*).collect()
    assert(math.abs(rows(0).getDouble(2) - 0.75) < 1e-12, "bullet_line_frac")
    assert(math.abs(rows(1).getDouble(3) - 2.0 / 3) < 1e-12, "ellipsis_line_frac")
    assert(math.abs(rows(2).getDouble(1) - 1.0) < 1e-12, "symbol_word_ratio")
    assert(math.abs(rows(3).getDouble(0) - 3.0) < 1e-12, "mean_word_len")
    // the '...' in doc 2 counts toward symbols too: 2 ellipses / 9 tokens
    assert(math.abs(rows(1).getDouble(1) - 2.0 / 9) < 1e-12, "ellipsis symbol count")
  }

  test("simhash: identical docs equal, near docs close, distant docs far (hamming)") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      (4L, "completely unrelated words describing database engine internals instead"))
    val hs = d.orderBy("doc_id").select(TextAnalysis.simhash($"text")).as[Long].collect()
    assert(hs(0) === hs(1))
    val near = java.lang.Long.bitCount(hs(0) ^ hs(2))
    val far = java.lang.Long.bitCount(hs(0) ^ hs(3))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 12)
  }

  test("grouped ngram-jaccard formulation equals the join formulation exactly") {
    // includes a duplicate doc_id (no self-pair) and a null bucket (dropped
    // like the equi-join drops it) — the two formulations must agree on both
    val d = ((0L until 60L).map { i =>
      (i, s"g${i % 4}", s"tok${i % 7}a tok${i % 5}b tok${i % 3}c common words here tok${i}d")
    } ++ Seq(
      (7L, "g3", "tok0a tok2b tok1c common words here tok7d"),
      (99L, null.asInstanceOf[String], "null bucket text body")))
      .toDF("doc_id", "source", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
        .collect().sortBy(x => (x._1, x._2)).toSeq
    assert(canon(Dedup.ngramJaccardPairs(d, "source")) ===
      canon(Dedup.ngramJaccardPairsGrouped(d, "source")))
  }

  test("ngram jaccard within bucket computes exact set similarity") {
    val d = Seq(
      (1L, "g1", "a b c d e"),
      (2L, "g1", "a b c d f"),
      (3L, "g2", "a b c d e")).toDF("doc_id", "source", "text")
    val pairs = Dedup.ngramJaccardPairs(d, "source")
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.length === 1) // only (1,2): 3 shared? shingles {abc,bcd,cde} vs {abc,bcd,cdf}
    assert(pairs.head._1 === 1L && pairs.head._2 === 2L)
    assert(math.abs(pairs.head._3 - 2.0 / 4.0) < 1e-12)
  }

  test("adaptive ngram dispatch picks grouped for many small buckets, join for few huge") {
    // many small buckets, enough groups to fill the cluster → grouped
    assert(Dedup.chooseNgramPlan(nBuckets = 10000, maxBucketSize = 50,
      parallelism = 32, maxGroupedBucket = 4096) === "grouped")
    // one boilerplate mega-bucket → join (distribute the quadratic work)
    assert(Dedup.chooseNgramPlan(nBuckets = 10000, maxBucketSize = 100000,
      parallelism = 32, maxGroupedBucket = 4096) === "join")
    // few buckets: grouped would cap parallelism at the bucket count → join
    assert(Dedup.chooseNgramPlan(nBuckets = 4, maxBucketSize = 500,
      parallelism = 32, maxGroupedBucket = 4096) === "join")
    // moderately under-parallel but small buckets: grouped still wins
    // (the join pays per-pair row copies) — measured at sf0.1
    assert(Dedup.chooseNgramPlan(nBuckets = 20, maxBucketSize = 250,
      parallelism = 32, maxGroupedBucket = 4096) === "grouped")
  }

  test("adaptive ngram dispatch output matches the join formulation in both regimes") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
        .collect().sortBy(x => (x._1, x._2)).toSeq
    // few-huge regime (2 buckets < test parallelism 4): join path
    val fewHuge = (0L until 80L)
      .map(i => (i, s"g${i % 2}", s"tok${i % 7}a tok${i % 5}b common words tok${i}d"))
      .toDF("doc_id", "source", "text")
    assert(canon(Dedup.ngramJaccardPairsAdaptive(fewHuge, "source")) ===
      canon(Dedup.ngramJaccardPairs(fewHuge, "source")))
    // many-small regime (40 buckets of 2): dispatcher takes the grouped path
    val manySmall = (0L until 80L)
      .map(i => (i, s"g${i / 2}", s"tok${i % 7}a tok${i % 5}b common words tok${i % 3}e"))
      .toDF("doc_id", "source", "text")
    assert(canon(Dedup.ngramJaccardPairsAdaptive(manySmall, "source")) ===
      canon(Dedup.ngramJaccardPairs(manySmall, "source")))
  }

  test("unigram LM cross-entropy matches the closed form and separates common from rare text") {
    // corpus: 8 tokens total — p(a)=4/8, p(b)=2/8, p(c)=p(d)=1/8
    val d = docs((1L, "a a a b"), (2L, "a b c d"))
    val res = TextAnalysis.lmCrossEntropy(d).orderBy("doc_id")
      .select("doc_id", "n_tokens", "cross_entropy")
      .as[(Long, Long, Double)].collect()
    val ln = (x: Double) => math.log(x)
    val h1 = -(3 * ln(0.5) + ln(0.25)) / 4
    val h2 = -(ln(0.5) + ln(0.25) + ln(0.125) + ln(0.125)) / 4
    assert(res.map(_._2).toSeq === Seq(4L, 4L))
    assert(math.abs(res(0)._3 - h1) < 1e-9 && math.abs(res(1)._3 - h2) < 1e-9)
    // the common-token doc is more predictable: lower cross-entropy
    assert(res(0)._3 < res(1)._3)
  }

  test("bigram stupid backoff matches the closed form on both branches") {
    // train: "a b a c" → c2{(a,b)=1,(b,a)=1,(a,c)=1}, c1{a=2,b=1,c=1}, T=4, V=3
    val train = docs((0L, "a b a c"))
    val corpus = docs(
      (0L, "a b a c"),
      (1L, "a b x"), // (a,b) trained MLE 1/2; (b,x) unseen → 0.4·(0+1)/7
      (2L, "c a"),   // (c,a) unseen, both tokens trained → 0.4·(2+1)/7
      (3L, "solo"))  // one token: no bigram positions → absent
    val res = TextAnalysis.lmCrossEntropyBigram(corpus, train)
      .select("doc_id", "n_bigrams", "cross_entropy")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val ln = (x: Double) => math.log(x)
    assert(res.keySet === Set(0L, 1L, 2L))
    val h0 = -(ln(0.5) + ln(1.0) + ln(0.5)) / 3 // (a,b)=1/2, (b,a)=1/1, (a,c)=1/2
    val h1 = -(ln(0.5) + ln(0.4 / 7)) / 2
    val h2 = -ln(0.4 * 3 / 7)
    assert(math.abs(res(0L)._2 - h0) < 1e-9 && res(0L)._1 == 3L)
    assert(math.abs(res(1L)._2 - h1) < 1e-9 && res(1L)._1 == 2L)
    assert(math.abs(res(2L)._2 - h2) < 1e-9 && res(2L)._1 == 1L)
    // trained text scores lower than backoff-dominated text
    assert(res(0L)._2 < res(2L)._2)
  }

  test("ccnet buckets: per-lang terciles, monotone in cross-entropy, thirds-sized") {
    // 9 docs per lang with strictly increasing rare-token content so the
    // tercile boundaries are unambiguous
    val rows = for (lang <- Seq("en", "de"); i <- 0 until 9) yield {
      val common = Seq.fill(12 - i)(s"$lang common word").mkString(" ")
      val rare = (0 until i).map(j => s"${lang}rare${i}_$j").mkString(" ")
      (lang.hashCode.toLong * 100 + i, s"$common $rare", lang)
    }
    val df = rows.toDF("doc_id", "text", "lang")
    val got = TextAnalysis.ccnetBuckets(df)
      .select("lang", "bucket", "cross_entropy")
      .as[(String, String, Double)].collect()
    for (lang <- Seq("en", "de")) {
      val byBucket = got.filter(_._1 == lang).groupBy(_._2).view
        .mapValues(_.map(_._3)).toMap
      assert(byBucket.keySet === Set("head", "middle", "tail"))
      assert(byBucket("head").size === 3 && byBucket("middle").size === 3
        && byBucket("tail").size === 3, s"$lang terciles not thirds: $byBucket")
      assert(byBucket("head").max <= byBucket("middle").min)
      assert(byBucket("middle").max <= byBucket("tail").min)
    }
  }

  test("bloom-gated contamination pairs equal the exact formulation, even at fpp=0.5") {
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")).toDF("bench_id", "text")
    val corpus = docs(
      (1L, "intro words alpha beta gamma delta epsilon zeta eta theta iota kappa outro"),
      (2L, "alpha beta unrelated content entirely different from the benchmark suite"),
      (3L, "nothing in common with anything at all here truly"))
    def canonPairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "bench_id", "n_shared").as[(Long, Long, Long)].collect().sorted.toSeq
    // an absurd fpp floods the gate with false positives; the exact join
    // must remove every one of them
    for (fpp <- Seq(0.01, 0.5); minShared <- Seq(1, 8)) {
      assert(canonPairs(Dedup.contaminationPairsBloom(corpus, bench, minShared, fpp = fpp)) ===
        canonPairs(Dedup.contaminationPairs(corpus, bench, minShared)))
    }
  }

  test("stateless contamination stream (batch form) equals the aggregate formulation") {
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")).toDF("bench_id", "text")
    val corpus = docs(
      (1L, "intro words alpha beta gamma delta epsilon zeta eta theta iota kappa outro"),
      (2L, "alpha beta unrelated content entirely different from the benchmark suite"),
      (3L, "nothing in common with anything at all here truly"))
    def canonPairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("bench_id"), col("n_shared").cast("long"))
        .as[(Long, Long, Long)].collect().sorted.toSeq
    for (minShared <- Seq(1, 8)) {
      assert(canonPairs(graft.streaming.StreamingOps.contaminationStream(corpus, bench, minShared)) ===
        canonPairs(Dedup.contaminationPairs(corpus, bench, minShared)))
    }
  }

  test("duplicate spans: flags repeated n-grams at their positions, counts within-doc repeats") {
    val d = docs(
      (1L, "a b c d e unique1 tail1"),   // "a b c d e" at pos 0
      (2L, "lead2 a b c d e unique2"),   // same 5-gram at pos 1
      (3L, "x y z w v x y z w v"),       // within-doc repeat: pos 0 and 5
      (4L, "totally different words here entirely"))
    val spans = Dedup.duplicateSpans(d, n = 5)
      .select("doc_id", "pos", "n_occurrences").as[(Long, Long, Long)].collect().toSet
    assert(spans.contains((1L, 0L, 2L)) && spans.contains((2L, 1L, 2L)))
    assert(spans.contains((3L, 0L, 2L)) && spans.contains((3L, 5L, 2L)))
    assert(!spans.exists(_._1 == 4L))
    // nothing flagged beyond the planted duplicates
    assert(spans.map(s => (s._1, s._2)) ===
      Set((1L, 0L), (2L, 1L), (3L, 0L), (3L, 5L)))

    // short-doc fallback: two copies of a sub-n doc flag each other at pos 0
    val short = docs((10L, "tiny doc"), (11L, "tiny doc"), (12L, "other tiny"))
    val s2 = Dedup.duplicateSpans(short, n = 50)
      .select("doc_id", "pos", "n_occurrences").as[(Long, Long, Long)].collect().toSet
    assert(s2 === Set((10L, 0L, 2L), (11L, 0L, 2L)))
  }

  test("maximal spans: overlapping anchors merge to exact region bounds, gaps split, short docs cap") {
    val d = docs(
      (1L, "p q r s t u v w tail1x"),  // shared 8-token run at pos 0
      (2L, "lead2a p q r s t u v w"),  // same run at pos 1
      // two occurrences of the 5-token run far apart in one doc: the
      // anchors are 11 > 0 + 5 apart, so the regions must NOT merge
      (3L, "p q r s t g1 g2 g3 g4 g5 g6 p q r s t"))
    val got = Dedup.maximalDuplicateSpans(d, n = 5)
      .select("doc_id", "span_start", "span_end", "n_anchors")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 0L, 8L, 4L),  // anchors 0..3 merge to [0, 8): the exact run
      (2L, 1L, 9L, 4L),
      (3L, 0L, 5L, 1L), (3L, 11L, 16L, 1L)))

    // sub-n doc: the whole-text fallback anchor's nominal 50-token
    // coverage is capped at the document's real token count
    val short = docs((10L, "tiny doc"), (11L, "tiny doc"), (12L, "other words"))
    val s2 = Dedup.maximalDuplicateSpans(short, n = 50)
      .select("doc_id", "span_start", "span_end", "n_anchors")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(s2 === Set((10L, 0L, 2L, 1L), (11L, 0L, 2L, 1L)))
  }

  test("line dedup: cross-doc boilerplate lines removed everywhere, unique lines survive in order") {
    val d = docs(
      (1L, "unique opening\nsubscribe now\nreal content one\nall rights reserved"),
      (2L, "subscribe now\nreal content two\nall rights reserved"),
      (3L, "only unique lines\nnothing shared here"),
      (4L, "subscribe now\nall rights reserved"), // fully boilerplate => empty
      (5L, "  subscribe now  \nindependent tail")) // trim-normalized match
    val dups = Dedup.duplicateLines(d).select("lkey", "n_docs")
      .as[(String, Long)].collect().toMap
    assert(dups === Map("subscribe now" -> 4L, "all rights reserved" -> 3L))

    val out = Dedup.removeDuplicateLines(d)
      .select("doc_id", "n_lines", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 4L, 2L, "unique opening\nreal content one"),
      (2L, 3L, 2L, "real content two"),
      (3L, 2L, 0L, "only unique lines\nnothing shared here"),
      (4L, 2L, 2L, ""),
      (5L, 2L, 1L, "independent tail")))

    // blank lines are never boilerplate: both docs keep theirs
    val blanks = docs((10L, "a\n\nb"), (11L, "c\n\nd"))
    val outB = Dedup.removeDuplicateLines(blanks)
      .select("doc_id", "n_removed", "clean_text").as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(outB === Seq((10L, 0L, "a\n\nb"), (11L, 0L, "c\n\nd")))
  }

  test("semantic near-dedup co-buckets verbatim copies and excludes distant vectors") {
    // 3 well-separated direction clusters + verbatim copies; far pairs share
    // no cell, so only the planted (i, i+100) pairs at cos_dist 0 survive
    val base = (0 until 30).map { i =>
      val axis = i % 3
      val v = Array.fill(8)(0.05f * ((i * 7 + 3) % 5))
      v(axis) = 10f + i * 0.01f  // dominant axis => 3 angular clusters
      (i.toLong, v)
    }
    val copies = base.take(9).map { case (id, v) => (id + 100L, v.map(x => x * 2f)) }
    val all = (base ++ copies).toDF("id", "vector")
    val pairs = Dedup.semanticNearDupPairs(all, c = 3, threshold = 1e-6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // scaled copies point the same direction: cos_dist = 0, always found
    assert((0L until 9L).map(i => (i, i + 100L)).toSet.subsetOf(pairs))
    // every surviving pair is genuinely below threshold (verify step ran)
    val dists = Dedup.semanticNearDupPairs(all, c = 3, threshold = 1e-6)
      .select("cos_dist").as[Double].collect()
    assert(dists.forall(_ <= 1e-6))
    // cross-cluster pairs (orthogonal axes, cos_dist ~ 1) never appear
    assert(pairs.forall { case (a, b) => (a % 100) % 3 == (b % 100) % 3 })
  }

  test("semantic near-dedup excludes zero vectors instead of crashing on normalize") {
    val all = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(2f, 0f, 0f, 0f)),
      (3L, Array(0f, 0f, 0f, 0f))).toDF("id", "vector")
    val pairs = Dedup.semanticNearDupPairs(all, c = 1, threshold = 0.01)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("cross-doc maximal spans: exact straddling bounds, same-diagonal splits, stride invariance") {
    val a = (0 until 100).map(i => s"w$i").mkString(" ")
    // doc 2 quotes a[10, 70) after a 3-token preamble: the run straddles
    // the grid differently in each doc (offsets 10 vs 3)
    val b = "j1 j2 j3 " + (10 until 70).map(i => s"w$i").mkString(" ") + " j4"
    // doc 3 quotes two runs split by one mismatched token — SAME diagonal
    // in the (1,3) pair, so the kernel must keep them separate
    val c = "j9 " + (10 until 30).map(i => s"w$i").mkString(" ") + " zz " +
      (31 until 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    def run(stride: Int, maxExtend: Int): Seq[(Long, Long, Long, Long, Long, Long, Long)] =
      Dedup.crossDocMaximalSpans(docs, n = 8, stride = stride, maxExtend = maxExtend)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val expected = Seq(
      (1L, 2L, 10L, 70L, 3L, 63L, 60L),
      (1L, 3L, 10L, 30L, 1L, 21L, 20L),
      (1L, 3L, 31L, 60L, 22L, 51L, 29L),
      (2L, 3L, 3L, 23L, 1L, 21L, 20L),
      (2L, 3L, 24L, 53L, 22L, 51L, 29L))
    assert(run(stride = 3, maxExtend = 50) === expected)
    // stride 1 with zero extension budget finds the same runs (all are
    // >= n + stride - 1 for both settings) — anchors alone cover them
    assert(run(stride = 1, maxExtend = 0) === expected)
    // a tiny capped extension still recovers exact bounds via chaining
    // (maxExtend = stride - 1 is the proven minimum)
    assert(run(stride = 3, maxExtend = 2) === expected)
    // hash-collision (or unverifiable) anchors are dropped by token
    // verification, not reported
    assert(Dedup.extendAnchors(Array("a", "b", "c", "d"),
      Array("x", "y", "z", "q"), Array((0, 0)), 2, 5).isEmpty)
    // knob guards
    intercept[IllegalArgumentException](
      Dedup.crossDocMaximalSpans(docs, n = 8, stride = 3, maxExtend = 1).collect())
    intercept[IllegalArgumentException](
      Dedup.crossDocMaximalSpans(docs, n = 8, stride = 9).collect())
  }

  test("keepBestPerGroup marks the highest-scoring member, ties by lowest id") {
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "group_id")
    val scores = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (10L, 1.0), (11L, 1.0))
      .toDF("id", "score")
    val got = Dedup.keepBestPerGroup(groups, scores)
      .select("id", "keep").as[(Long, Long)].collect().toMap
    // group 1: ids 2 and 3 tie at 9.0 — lowest id wins
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 10L -> 1L, 11L -> 0L))
    // exactly one keeper per group regardless of layout
    val again = Dedup.keepBestPerGroup(groups.repartition(5), scores.repartition(3))
      .groupBy("group_id").agg(sum("keep").as("k")).as[(Long, Long)].collect().toMap
    assert(again === Map(1L -> 1L, 10L -> 1L))
  }

  test("keepBestPerGroup fails loudly on an unscored grouped id (never silently drops it)") {
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "group_id")
    val partial = Seq((1L, 5.0), (3L, 9.0)).toDF("id", "score") // id 2 unscored
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val ex = intercept[Exception](
      Dedup.keepBestPerGroup(groups, partial).collect())
    assert(messages(ex).exists(_.contains("no score")), messages(ex).mkString("; "))
  }

  test("curate(keeperScores) fails loudly when a near-dup group member is unscored") {
    // two near-identical docs form one LSH group; the scores table misses
    // doc 2 — before the fail-loud contract it was neither keeper nor
    // drop and silently survived curation
    val base = "the quick brown fox jumps over the lazy dog and then runs " +
      "through the quiet green field near the old stone bridge every single " +
      "morning before the bright sun rises above the distant eastern hills"
    val docs = Seq((1L, s"$base today"), (2L, s"$base again"),
      (3L, "totally different words about unrelated engine internals entirely"))
      .toDF("doc_id", "text")
    val emb = Seq((1L, Array.fill(4)(1f)), (2L, Array.fill(4)(1f)),
      (3L, Array.fill(4)(1f))).toDF("vec_id", "embedding")
    val partial = Seq((1L, 0.9), (3L, 0.5)).toDF("id", "score") // doc 2 unscored
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val ex = intercept[Exception](
      graft.pipeline.Curation.curate(docs, emb, minQuality = 0.0,
        nearDupThreshold = Some(0.5), keeperScores = Some(partial)).collect())
    assert(messages(ex).exists(_.contains("no score")), messages(ex).mkString("; "))
    // full coverage: the same pipeline completes and keeps the best member
    val full = Seq((1L, 0.1), (2L, 0.9), (3L, 0.5)).toDF("id", "score")
    val kept = graft.pipeline.Curation.curate(docs, emb, minQuality = 0.0,
        nearDupThreshold = Some(0.5), keeperScores = Some(full))
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(2L) && !kept.contains(1L), s"kept=$kept")
  }

  test("removeDuplicateSpansKeepFirst keeps the canonical copy, cuts the rest") {
    val para = (0 until 12).map(i => s"p$i").mkString(" ")
    // doc 1 owns the canonical copy (lowest (doc_id, pos)); docs 2 and 3
    // quote it; doc 2 also repeats it WITHIN itself (second copy cut)
    val docs = Seq(
      (1L, s"$para alpha beta gamma"),
      (2L, s"lead in words $para and again $para tail"),
      (3L, s"x0 x1 x2 $para y0"),
      (4L, "completely unique text with no repeats at all")
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpansKeepFirst(docs, n = 8)
      .as[(Long, String)].collect().toMap
    // doc 1: canonical — untouched
    assert(got(1L) === s"$para alpha beta gamma")
    // docs 2, 3: every quoted token cut, context survives
    assert(got(2L) === "lead in words and again tail")
    assert(got(3L) === "x0 x1 x2 y0")
    assert(got(4L) === "completely unique text with no repeats at all")
    // the corpus still contains the paragraph exactly once
    val joined = got.values.mkString(" ")
    assert(joined.indexOf(para) === joined.lastIndexOf(para) && joined.contains(para))
    // contrast: the cut-all form removes the canonical copy too
    val all = Dedup.removeDuplicateSpans(docs, n = 8)
      .as[(Long, String)].collect().toMap
    assert(all(1L) === "alpha beta gamma")
  }

  test("removeDuplicateSpansKeepFirst preserves STRING doc ids (planted duplicates are cut)") {
    // regression: a cast(idCol as long) turned string ids into nulls, the
    // join back never matched, and every doc silently passed through uncut
    val para = (0 until 12).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      ("docA", s"$para alpha beta gamma"),
      ("docB", s"lead in words $para tail"),
      ("docC", s"x0 x1 x2 $para y0")
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpansKeepFirst(docs, n = 8)
      .as[(String, String)].collect().toMap
    // "docA" is the lexicographically-first (doc_id, pos) — canonical
    assert(got("docA") === s"$para alpha beta gamma")
    assert(got("docB") === "lead in words tail")
    assert(got("docC") === "x0 x1 x2 y0")
    // and the cut-all sibling keeps behaving identically on string ids
    val all = Dedup.removeDuplicateSpans(docs, n = 8)
      .as[(String, String)].collect().toMap
    assert(all("docA") === "alpha beta gamma")
  }

  test("removeContaminationSpans cuts exactly the reported benchmark spans") {
    val benchText = (0 until 40).map(i => s"b$i").mkString(" ")
    val bench = Seq((7L, benchText)).toDF("bench_id", "text")
    // doc 1 quotes bench positions [5, 30) after a 2-token preamble;
    // doc 2 is clean; doc 3 IS the benchmark (full self-overlap)
    val quoted = "intro words " + (5 until 30).map(i => s"b$i").mkString(" ") + " trailing text here"
    val clean = (0 until 30).map(i => s"c$i").mkString(" ")
    val docs = Seq((1L, quoted), (2L, clean), (3L, benchText)).toDF("doc_id", "text")
    val got = Dedup.removeContaminationSpans(docs, bench, n = 8, stride = 3,
        maxExtend = 50)
      .as[(Long, String)].collect().toMap
    // the 25-token quote (>= n + stride - 1 = 10) is cut, bounds exact
    assert(got(1L) === "intro words trailing text here")
    // untouched doc passes through (normalized token stream)
    assert(got(2L) === clean)
    // a corpus doc identical to a benchmark doc loses everything
    assert(got(3L) === "")
    // below-threshold overlap (9 shared tokens < 10) is NOT cut
    val short = "x0 x1 " + (0 until 9).map(i => s"b$i").mkString(" ") + " y0 y1"
    val got2 = Dedup.removeContaminationSpans(
      Seq((4L, short)).toDF("doc_id", "text"), bench, n = 8, stride = 3,
      maxExtend = 50).as[(Long, String)].collect().toMap
    assert(got2(4L) === short)
  }

  test("cross-doc spans: near-identical long pair stays exact through island compression") {
    // the adversarial shape island compression exists for: two 2000-token
    // documents sharing one giant run — the raw anchor join emits ~2000
    // matched anchors on one diagonal, which must fold to O(1) islands
    // and still report the exact bounds
    val base = (0 until 2000).map(i => s"w$i")
    val docA = base.mkString(" ")
    // doc B = 3-token preamble + base with one token mutated at 1200
    val docB = ("p0 p1 p2 " +
      base.updated(1200, "MUT").mkString(" "))
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val got = Dedup.crossDocMaximalSpans(docs, n = 50, stride = 7, maxExtend = 200)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got === Seq(
      (1L, 2L, 0L, 1200L, 3L, 1203L, 1200L),
      (1L, 2L, 1201L, 2000L, 1204L, 2003L, 799L)))
    // kernel equivalence: a multi-count island expands to exactly the raw
    // anchor positions (start + i*stride), so both forms must agree
    val ta = base.toArray
    val tb = docB.split(" ")
    val islands = Array((-3, 0, 170)) // diag, start, cnt: anchors 0,7,...,1183
    val raw = (0 until 170).map(i => (i * 7, i * 7 + 3)).toArray
    assert(Dedup.extendIslands(ta, tb, islands, 50, 7, 200) ===
      Dedup.extendAnchors(ta, tb, raw, 50, 200))
  }

  test("cross-doc spans equal a naive quadratic reference on a random small-alphabet corpus") {
    // 3-symbol alphabet, 60-token docs: dense accidental shared runs on
    // many diagonals — an adversarial workout for anchor merging,
    // frontier extension, and the detection threshold, checked against a
    // direct O(lenA·lenB) diagonal walk
    def tok(seed: Long): String = {
      val u = graft.core.SplitMix.unit(graft.core.SplitMix.mix(seed))
      "abc".charAt(math.min(2, (u * 3).toInt)).toString
    }
    val corpora = (0 until 6).map { di =>
      (di.toLong, (0 until 60).map(p => tok(di * 1000L + p)).mkString(" "))
    }
    val docs = corpora.toDF("doc_id", "text")
    val n = 5
    val stride = 2
    val minLen = n + stride - 1
    def naive(a: Array[String], b: Array[String]): Set[(Long, Long, Long, Long)] = {
      val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long)]
      for (d <- -(b.length - 1) to (a.length - 1)) {
        val lo = math.max(0, d)
        val hi = math.min(a.length, b.length + d) // exclusive
        var i = lo
        var runStart = -1
        while (i <= hi) {
          val m = i < hi && a(i) == b(i - d)
          if (m && runStart < 0) runStart = i
          if (!m && runStart >= 0) {
            if (i - runStart >= minLen)
              out += ((runStart.toLong, i.toLong, (runStart - d).toLong, (i - d).toLong))
            runStart = -1
          }
          i += 1
        }
      }
      out.toSet
    }
    val toksMap = corpora.map { case (id, t) => id -> t.split(" ") }.toMap
    val want = (for {
      (i, _) <- corpora
      (j, _) <- corpora if i < j
      sp <- naive(toksMap(i), toksMap(j))
    } yield (i, j, sp._1, sp._2, sp._3, sp._4)).toSet
    val got = Dedup.crossDocMaximalSpans(docs, n = n, stride = stride, maxExtend = 50)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2, t._3, t._4, t._5, t._6)).toSet
    assert(want.nonEmpty, "degenerate fixture: no shared runs to check")
    assert(got === want)
    // the tiny-cap configuration must agree too (frontier chaining)
    val gotTiny = Dedup.crossDocMaximalSpans(docs, n = n, stride = stride,
        maxExtend = stride - 1)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2, t._3, t._4, t._5, t._6)).toSet
    assert(gotTiny === want)
  }

  test("cross-doc span skew guard is ON by default: a 1k-doc license-header corpus completes linearly") {
    // every doc opens with the same 20-token license header — under the
    // old default (no cap) the anchor join fans out to ~500k pairs; the
    // default maxAnchorFreq=128 excises the header grams (freq 1000),
    // keeping the join linear and the pairwise output empty (boilerplate
    // is removeDuplicateSpans/duplicateLines material, not span material)
    val header = (0 until 20).map(i => s"lic$i").mkString(" ")
    // docs 7 and 13 additionally share a UNIQUE 25-token passage (freq 2,
    // far under the cap) — the guard must NOT swallow a legit pair
    val passage = (0 until 25).map(i => s"pz$i").mkString(" ")
    val docs = (0 until 1000).map { i =>
      val tail = if (i == 7 || i == 13) passage
        else (0 until 25).map(j => s"u${i}x$j").mkString(" ")
      (i.toLong, s"$header $tail")
    }.toDF("doc_id", "text")
    // docs 7 and 13 are identical (header + passage): the excised header
    // anchors cost no exactness because extension from the surviving
    // straddle anchors walks the matching header tokens back to 0 — the
    // FULL 45-token shared run is reported; header-only pairs (no
    // surviving anchor at all) are not
    val got = Dedup.crossDocMaximalSpans(docs, n = 10, stride = 2, maxExtend = 30)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((7L, 13L, 0L, 45L, 0L, 45L, 45L)))
    // contaminationSpans is EXACT BY DEFAULT (corpus×bench fans out
    // linearly — bench side is eval-suite-sized): every header-carrying
    // doc reports its header overlap (widespread contamination is the
    // worst kind to silently miss), the two quoting docs report the full
    // 45-token run
    val bench = Seq((1L, s"$header $passage")).toDF("bench_id", "text")
    val spans = Dedup.contaminationSpans(docs, bench, n = 10, stride = 2, maxExtend = 30)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(spans.size === 1000)
    assert(spans.filter(s => s._1 == 7L || s._1 == 13L) === Seq(
      (7L, 1L, 0L, 45L, 0L, 45L, 45L),
      (13L, 1L, 0L, 45L, 0L, 45L, 45L)))
    assert(spans.filterNot(s => s._1 == 7L || s._1 == 13L)
      .forall(s => s._3 == 0L && s._4 == 20L && s._7 == 20L))
    // the frequency cap is an explicit forensics-speed OPT-IN there —
    // with it, only the sub-cap passage survives
    val capped = Dedup.contaminationSpans(docs, bench, n = 10, stride = 2,
        maxExtend = 30, maxAnchorFreq = 128)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(capped === Seq(
      (7L, 1L, 0L, 45L, 0L, 45L, 45L),
      (13L, 1L, 0L, 45L, 0L, 45L, 45L)))
    // explicit opt-out on a small slice still reports every header pair
    val small = docs.filter(col("doc_id") < 10)
    val optOut = Dedup.crossDocMaximalSpans(small, n = 10, stride = 2,
      maxExtend = 30, maxAnchorFreq = Int.MaxValue)
    assert(optOut.count() === 45L) // C(10,2): every pair shares the header
  }

  test("contamination spans: exact benchmark positions inside corpus docs, straddling grid") {
    val benchText = (0 until 40).map(i => s"b$i").mkString(" ")
    // corpus doc 5 quotes bench positions [7, 31) after a 2-token preamble
    val contaminated = "c1 c2 " + (7 until 31).map(i => s"b$i").mkString(" ") + " c3"
    val clean = (0 until 40).map(i => s"u$i").mkString(" ")
    val docs = Seq((5L, contaminated), (6L, clean)).toDF("doc_id", "text")
    val bench = Seq((1L, benchText)).toDF("bench_id", "text")
    val spans = Dedup.contaminationSpans(docs, bench, n = 8, stride = 3, maxExtend = 10)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans === Seq((5L, 1L, 2L, 26L, 7L, 31L, 24L)))
  }
}
