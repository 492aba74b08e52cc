package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** docNovelty / corpusZipf: planted-value checks and closed-form fits. */
class TextDiagnosticsSpec extends SparkTestBase {
  import spark.implicits._

  test("docNovelty: duplicated docs score 0, a unique doc scores 1, mixtures in between") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),      // shares all shingles with 2
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four five six"),         // fully unique
      (4L, "alpha beta gamma zeta eta theta"))     // shares "alpha beta gamma" only
      .toDF("doc_id", "text")
    val out = TextAnalysis.docNovelty(d, n = 3).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L)._3 == 0.0 && out(2L)._3 == 0.0)
    assert(out(3L) == ((4L, 4L, 1.0)))
    // doc 4: shingles {alpha beta gamma, beta gamma zeta, gamma zeta eta,
    // zeta eta theta}; only the first is shared
    assert(out(4L) == ((4L, 3L, 0.75)))
  }

  test("docNovelty: short docs fall back to the whole-text shingle") {
    val d = Seq((1L, "hi there"), (2L, "hi there"), (3L, "bye")).toDF("doc_id", "text")
    val out = TextAnalysis.docNovelty(d, n = 3).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 1L, 0.0), (2L, 1L, 0.0), (3L, 1L, 1.0)))
  }

  test("corpusZipf: counts, TTR, and the OLS slope match a closed-form fit") {
    // source s: freqs a=4, b=2, c=1 → exact OLS over (ln rank, ln freq)
    val d = Seq(
      (1L, "s", "a a a a b"),
      (2L, "s", "b c"),
      (3L, "t", "x x x x x")) // single distinct token: degenerate → 0.0
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.corpusZipf(d, topK = 100).orderBy("source").collect()
    val s = out(0)
    assert(s.getString(0) == "s" && s.getLong(1) == 7L && s.getLong(2) == 3L)
    assert(math.abs(s.getDouble(3) - 3.0 / 7.0) < 1e-12)
    val pts = Seq((math.log(1.0), math.log(4.0)), (math.log(2.0), math.log(2.0)),
      (math.log(3.0), math.log(1.0)))
    val k = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (sxy, sxx) = (pts.map(p => p._1 * p._2).sum, pts.map(p => p._1 * p._1).sum)
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(math.abs(s.getDouble(4) - slope) < 1e-9)
    assert(slope < 0, "frequencies decay with rank")
    val t = out(1)
    assert(t.getString(0) == "t" && t.getLong(1) == 5L && t.getLong(2) == 1L
      && t.getDouble(4) == 0.0)
  }

  test("corpusZipf: topK truncates the fit window; degenerate params loud") {
    val d = Seq((1L, "s", "a a a b b c d e f g")).toDF("doc_id", "source", "text")
    val full = TextAnalysis.corpusZipf(d, topK = 100).collect().head.getDouble(4)
    val top2 = TextAnalysis.corpusZipf(d, topK = 2).collect().head.getDouble(4)
    assert(full != top2) // different fit windows, different slopes
    intercept[IllegalArgumentException](TextAnalysis.corpusZipf(d, topK = 1))
    intercept[IllegalArgumentException](TextAnalysis.docNovelty(d, n = 0))
  }
}
