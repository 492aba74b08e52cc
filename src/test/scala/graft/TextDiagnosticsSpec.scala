package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** docNovelty / corpusZipf: planted-value checks and closed-form fits. */
class TextDiagnosticsSpec extends SparkTestBase {
  import spark.implicits._

  test("normalizeText: NFC composes, CR folds, controls strip, runs collapse, idempotent") {
    val d = Seq(
      (1L, "café"),                    // decomposed -> precomposed é
      (2L, "a\r\nb\rc\nd"),                  // CRLF/CR -> LF
      (3L, "xyz!"),        // C0 + DEL strip
      (4L, " a  b\t\tc "),                   // runs collapse + trim
      (5L, "plain ascii text"))
      .toDF("doc_id", "text")
    val out = d.select($"doc_id", TextAnalysis.normalizeText($"text").as("n"))
      .orderBy("doc_id").as[(Long, String)].collect().toMap
    assert(out(1L) === "café")
    assert(out(2L) === "a\nb\nc\nd")
    assert(out(3L) === "xyz!")
    assert(out(4L) === "a b c")
    assert(out(5L) === "plain ascii text")
    // idempotence: a second pass changes nothing
    val twice = d.select($"doc_id",
      TextAnalysis.normalizeText(TextAnalysis.normalizeText($"text")).as("n"))
      .orderBy("doc_id").as[(Long, String)].collect().toMap
    assert(twice === out)
  }

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

  test("WordShingleSet kernel is byte-identical to the shingleStrings HOF chain") {
    val texts = Seq(
      "the quick brown fox jumps the quick brown fox",
      "repeat repeat repeat repeat",
      "one two", "", "   ", "\tTAB lead\t", "a",
      "café Über straße tür café Über straße tür",
      "ends with newline\n", "x  double  spaces  x")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (n <- Seq(2, 3, 5)) {
      val hof = df
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), posexplode(TextAnalysis.shingleStrings(col("__toks"), n)))
        .as[(Long, Int, String)].collect().toSeq.sorted
      val kernel = df.select(col("doc_id"), posexplode(graft.internal.SqlBridge.column(
          graft.functions.WordShingleSet(graft.internal.SqlBridge.expression(col("text")), n))))
        .as[(Long, Int, String)].collect().toSeq.sorted
      assert(kernel === hof, s"n=$n")
    }
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

  test("repetitionSignals: hand-pinned Gopher values per family") {
    val navDoc = "nav bar\nnav bar\nnav bar\nreal content here stays" // T=47
    val paraDoc = "pp qq\n\npp qq\n\nrr ss tt"
    val loopDoc = ("buy gold now " * 12).trim
    val d = Seq((1L, navDoc), (2L, paraDoc), (3L, loopDoc), (4L, "clean short text"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.repetitionSignals(col("text")).as("s"))
      .select(col("doc_id"), col("s.*"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // nav lines: 2 of 4 lines are repeats, 14 of 47 chars
    assert(d(1L).getDouble(1) == 0.5)
    assert(math.abs(d(1L).getDouble(2) - 14.0 / 47) < 1e-12)
    assert(d(1L).getDouble(3) == 0.0) // no \n\n: one paragraph
    // "nav bar" x3 x 6 gram chars over 47
    assert(math.abs(d(1L).getDouble(5) - 18.0 / 47) < 1e-12)
    assert(d(1L).getDouble(8) == 0.0) // no duplicated 5-gram
    // paragraphs: "pp qq" repeats (1 of 3), 5 chars of 22
    val pT = paraDoc.length.toDouble
    assert(math.abs(d(2L).getDouble(3) - 1.0 / 3) < 1e-12)
    assert(math.abs(d(2L).getDouble(4) - 5.0 / pT) < 1e-12)
    // the loop: every token is covered by a duplicated 5..10-gram
    val lT = loopDoc.length.toDouble
    val lTokChars = loopDoc.replace(" ", "").length.toDouble
    (8 to 13).foreach { i =>
      assert(math.abs(d(3L).getDouble(i) - lTokChars / lT) < 1e-12, s"field $i")
    }
    // clean short doc: zeros everywhere except top-gram shares
    (1 to 4).foreach(i => assert(d(4L).getDouble(i) == 0.0))
    (8 to 13).foreach(i => assert(d(4L).getDouble(i) == 0.0))
    assert(d(4L).getDouble(5) > 0.0) // top-2-gram exists with count 1
  }

  test("repetitionSignals matches an independent reference over the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val got = docs
      .select(col("doc_id"), TextAnalysis.repetitionSignals(col("text")).as("s"))
      .select(col("doc_id"), col("s.*"))
      .collect().map(r => r.getLong(0) -> (1 to 13).map(r.getDouble).toSeq).toMap
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val exp = refRepetition(text)
      val g = got(id)
      exp.indices.foreach(i => assert(math.abs(g(i) - exp(i)) < 1e-12,
        s"doc $id field $i: got ${g(i)} want ${exp(i)}"))
    }
  }

  /** Independent reference: scala collections, no shared code. */
  private def refRepetition(text: String): Seq[Double] = {
    val T = text.codePointCount(0, text.length).toDouble
    if (T == 0) return Seq.fill(13)(0.0)
    def dup(parts: Seq[String]) = {
      val c = parts.groupBy(identity).view.mapValues(_.size).toMap
      val reps = c.collect { case (_, n) if n >= 2 => n - 1 }.sum
      val repCh = c.collect { case (k, n) if n >= 2 =>
        (n - 1).toLong * k.codePointCount(0, k.length) }.sum
      (reps.toDouble / parts.size, repCh / T)
    }
    val (lf, lc) = dup(text.split("\n", -1).toSeq)
    val (pf, pc) = dup(text.split("\n\n", -1).toSeq)
    val toks = text.replaceAll("^ +| +$", "").toLowerCase.split("\\s+").toSeq
    val tops = (2 to 4).map { n =>
      if (toks.size < n) 0.0
      else {
        val c = toks.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).view.mapValues(_.size).toSeq
        val (g, cnt) = c.minBy { case (g, cnt) => (-cnt, g) }
        cnt * (g.codePointCount(0, g.length) - (n - 1)).toDouble / T
      }
    }
    val covs = (5 to 10).map { n =>
      if (toks.size < n) 0.0
      else {
        val pos = (0 to toks.size - n).groupBy(i => toks.slice(i, i + n).mkString(" "))
        val covered = Array.fill(toks.size)(false)
        pos.values.filter(_.size >= 2)
          .foreach(_.foreach(s => (s until s + n).foreach(covered(_) = true)))
        toks.indices.filter(covered)
          .map(i => toks(i).codePointCount(0, toks(i).length)).sum / T
      }
    }
    Seq(lf, lc, pf, pc) ++ tops ++ covs
  }

  test("httpResponse: envelope strip, parameter drop, malformed nulls") {
    import spark.implicits._
    def parse(p: String): (Option[Long], Option[String], Option[String]) = {
      val r = Seq(p).toDF("p")
        .select(TextAnalysis.httpResponse(col("p")).as("h"))
        .select("h.status", "h.content_type", "h.body").head()
      (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        Option(r.getString(1)), Option(r.getString(2)))
    }
    assert(parse("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n<html>x</html>")
      === ((Some(200L), Some("text/html"), Some("<html>x</html>"))))
    // header NAME is case-insensitive; value params drop at ';'
    assert(parse("HTTP/1.0 301 Moved\r\nCONTENT-TYPE: Text/Plain\r\n\r\nmoved")
      === ((Some(301L), Some("Text/Plain"), Some("moved"))))
    // no blank line = torn envelope: ALL fields null — a header block
    // that never terminates yields no trusted fields and must not leak
    // headers downstream as text
    assert(parse("HTTP/1.1 200 OK\r\nContent-Type: text/html")
      === ((None, None, None)))
    // non-HTTP status line: status null, headers still scanned
    assert(parse("ICY 200 OK\r\nContent-Type: audio/mpeg\r\n\r\nstream")
      === ((None, Some("audio/mpeg"), Some("stream"))))
    // empty body after a valid envelope
    assert(parse("HTTP/1.1 204 No Content\r\n\r\n")
      === ((Some(204L), None, Some(""))))
    // a content-type-looking line in the BODY must not match (anchored to head)
    assert(parse("HTTP/1.1 200 OK\r\n\r\nContent-Type: fake/type")
      === ((Some(200L), None, Some("Content-Type: fake/type"))))
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
