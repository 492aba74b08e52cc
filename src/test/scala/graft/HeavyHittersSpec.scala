package graft

import graft.text.HeavyHitters
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters: sketch invariants, merge error accounting,
  * end-to-end exactness vs a plain count, and the loud-failure contract.
  */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private def unit(x: Long): Double = graft.core.SplitMix.unit(graft.core.SplitMix.mix(x))

  test("sketch invariant: cnt(g) <= true(g) <= cnt(g) + err, absent <= err") {
    // zipf-ish stream: item i appears ~1000/(i+1) times, deterministic shuffle
    val stream = (0 until 60).flatMap(i => Seq.fill(1000 / (i + 1))(s"w$i"))
      .sortBy(s => unit(s.hashCode.toLong))
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (m <- Seq(4, 16, 64)) {
      val s = HeavyHitters.sketchPartition(stream.iterator, m)
      assert(s.total === stream.size)
      truth.foreach { case (g, t) =>
        val c = s.counts.getOrElse(g, 0L)
        assert(c <= t && t <= c + s.err, s"m=$m g=$g cnt=$c true=$t err=${s.err}")
      }
    }
  }

  test("merge preserves the invariant and truncates to m with accounted error") {
    val s1 = HeavyHitters.sketchPartition(
      (0 until 500).map(i => s"a${i % 20}").iterator, 8)
    val s2 = HeavyHitters.sketchPartition(
      (0 until 500).map(i => s"b${i % 20}").iterator, 8)
    val mrg = HeavyHitters.merge(s1, s2, 8)
    assert(mrg.counts.size <= 8)
    assert(mrg.total === 1000)
    // a-side truth: 25 each; b-side truth: 25 each
    mrg.counts.foreach { case (g, c) => assert(c <= 25 && 25 <= c + mrg.err, s"$g $c") }
  }

  test("ngramTopK equals the plain exact count (generous m)") {
    val docs = (0 until 200).map { i =>
      val filler = (0 until 6).map(j => s"x${unit(i.toLong * 31 + j) * 50 % 50}".take(4)).mkString(" ")
      (i.toLong, if (i % 3 == 0) s"the quick brown fox $filler" else s"$filler jumps over it")
    }.toDF("doc_id", "text")
    val got = HeavyHitters.ngramTopK(docs, n = 3, k = 5, m = 4096)
      .select("gram", "n_count", "rank").as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    val exact = HeavyHitters.ngrams(docs, 3).groupBy("gram").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("gram")).limit(5)
      .as[(String, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) === exact)
    assert(got.map(_._3) === (1 to 5))
  }

  test("unprovable top-k fails loudly instead of returning an approximation") {
    // near-uniform grams: with a tiny m the error bound swamps the k-th count
    val docs = (0 until 400).map(i => (i.toLong, s"u$i v$i w$i z$i")).toDF("doc_id", "text")
    val e = intercept[Exception](HeavyHitters.ngramTopK(docs, n = 3, k = 3, m = 4).collect())
    assert(e.getMessage.contains("not provable"), e.getMessage)
  }

  test("empty corpus returns an empty exact result") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(HeavyHitters.ngramTopK(docs, n = 3, k = 5, m = 64).count() === 0)
  }
}
