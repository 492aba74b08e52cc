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
}
