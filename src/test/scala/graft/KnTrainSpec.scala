package graft

import graft.text.ArpaLm
import org.apache.spark.sql.functions._

class KnTrainSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ran"),
    (3L, "a dog sat on a mat"),
    (4L, "the dog ran fast"),
    (5L, "a cat and a dog"),
    (6L, "san francisco san francisco san francisco")).toDF("doc_id", "text")

  private def model = ArpaLm.trainKneserNeyBigram(corpus)

  test("probabilities sum to 1 per context: seen mass + bow * unseen mass") {
    val m = model.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4)))
    val uni = m.filter(_._1 == 1)
    val big = m.filter(_._1 == 2)
    // unigram level: continuation types + <unk> must sum to 1 (<s> is
    // context-only and excluded from the predicted support)
    val uniSum = uni.filter(_._3 != "<s>").map(r => math.pow(10, r._4)).sum
    assert(math.abs(uniSum - 1.0) < 1e-9, s"unigram mass $uniSum")
    // every context: sum of stored interpolated bigram probs plus
    // bow(v) * (unigram mass of the UNSEEN continuations + <unk>)
    val p1 = uni.filter(_._3 != "<s>").map(r => r._3 -> math.pow(10, r._4)).toMap
    big.groupBy(_._2).foreach { case (v, rows) =>
      val seen = rows.map(_._3).toSet
      val bow = math.pow(10, uni.find(_._3 == v).get._5)
      val mass = rows.map(r => math.pow(10, r._4)).sum +
        bow * p1.filterNot { case (w, _) => seen(w) }.values.sum
      assert(math.abs(mass - 1.0) < 1e-9, s"context '$v' mass $mass")
    }
  }

  test("continuation counts, not raw frequency: francisco is frequent but predictable") {
    // "francisco" appears 3 times but ONLY after "san"; "dog" appears 3
    // times after 3 distinct contexts — KN's continuation unigram must
    // rank dog above francisco even at equal raw frequency
    val uni = model.filter(col("order") === 1)
      .select("word", "log10p").as[(String, Double)].collect().toMap
    assert(uni("dog") > uni("francisco"),
      s"dog ${uni("dog")} must outrank francisco ${uni("francisco")}")
  }

  test("structure: <s> context-only with real bow; </s> never a context; <unk> leftover") {
    val m = model.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4)))
    val s = m.find(r => r._1 == 1 && r._3 == "<s>").get
    assert(s._4 === -99.0 && s._5 < 0.0, "<s>: floor prob, real backoff")
    val eos = m.find(r => r._1 == 1 && r._3 == "</s>").get
    assert(eos._5 === 0.0, "</s> is never a context: backoff 0")
    assert(!m.exists(r => r._1 == 2 && r._2 == "</s>"), "no bigram context </s>")
    val unk = m.find(r => r._1 == 1 && r._3 == "<unk>").get
    assert(unk._4 < 0.0 && math.pow(10, unk._4) > 0.0)
    assert(!m.exists(r => r._1 == 2 && r._3 == "<s>"), "<s> is never predicted")
  }

  test("train -> format -> parse round trip is the identity") {
    val trained = model.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4))).sorted
    val reparsed = ArpaLm.parse(ArpaLm.format(model).toDF("line"))
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4))).sorted
    assert(trained === reparsed)
  }

  test("the trained model scores through ArpaLm.score: fluent < OOV soup") {
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "qq ww ee rr")).toDF("doc_id", "text")
    val ppl = ArpaLm.score(docs, model, order = 2)
      .orderBy("doc_id").select("ppl").as[Double].collect()
    assert(ppl(0) < ppl(1))
    // and a degenerate singleton-free corpus fails loud, not NaN
    val e = intercept[IllegalArgumentException] {
      ArpaLm.trainKneserNeyBigram(
        Seq((1L, "x y"), (2L, "x y"), (3L, "x y")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("n1 = 0"))
  }

  test("empty/whitespace docs train the (<s>, </s>) bigram, never a '' vocab word") {
    val withEmpty = corpus.unionByName(
      Seq((7L, ""), (8L, "   ")).toDF("doc_id", "text"))
    val m = ArpaLm.trainKneserNeyBigram(withEmpty)
    assert(m.filter(col("word") === "").count() === 0)
    assert(m.filter(col("order") === 2 && col("context") === "").count() === 0)
    assert(m.filter(col("order") === 2 && col("context") === "<s>" && col("word") === "</s>").count() === 1)
    // and the full loop survives: format -> parse -> score
    val reparsed = ArpaLm.parse(ArpaLm.format(m).toDF("line"))
    assert(reparsed.count() === m.count())
  }

  test("trigram: probability mass sums to 1 through the FULL cascade, every context") {
    val m = ArpaLm.trainKneserNey(corpus, 3).collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4)))
    val lp = m.map(r => (r._1, r._2, r._3) -> r._4).toMap
    val bow = m.filter(_._1 < 3).map(r =>
      (if (r._2.isEmpty) r._3 else s"${r._2} ${r._3}") -> r._5).toMap
    val support = m.filter(r => r._1 == 1 && r._3 != "<s>").map(_._3)
    def p(w: String, v: String, u: String): Double = {
      lp.get((3, s"$u $v", w)).map(x => math.pow(10, x)).getOrElse(
        math.pow(10, bow.getOrElse(s"$u $v", 0.0)) *
          lp.get((2, v, w)).map(x => math.pow(10, x)).getOrElse(
            math.pow(10, bow.getOrElse(v, 0.0)) * math.pow(10, lp((1, "", w)))))
    }
    val ctx3 = m.filter(_._1 == 3).map(_._2).distinct
    assert(ctx3.nonEmpty)
    ctx3.foreach { c =>
      val Array(u, v) = c.split(" ")
      val mass = support.map(w => p(w, v, u)).sum
      assert(math.abs(mass - 1.0) < 1e-9, s"context '$c' cascade mass $mass")
    }
    // level-2 contexts too (continuation-estimated probabilities)
    m.filter(_._1 == 2).map(_._2).distinct.foreach { v =>
      val mass = support.map { w =>
        lp.get((2, v, w)).map(x => math.pow(10, x)).getOrElse(
          math.pow(10, bow.getOrElse(v, 0.0)) * math.pow(10, lp((1, "", w))))
      }.sum
      assert(math.abs(mass - 1.0) < 1e-9, s"level-2 context '$v' mass $mass")
    }
  }

  test("trigram <s>-exception: sentence-initial bigrams keep actual counts and real entries") {
    val m = ArpaLm.trainKneserNey(corpus, 3)
    // (<s>, w) bigrams cannot be left-extended; they must still be in
    // the level-2 table (actual counts) so trigram backoff through them
    // works — and <s>-initial trigram contexts must carry backoff rows
    assert(m.filter(col("order") === 2 && col("context") === "<s>").count() > 0)
    assert(m.filter(col("order") === 3 && col("context").startsWith("<s> ")).count() > 0)
    // the trained trigram scores through the generic scorer
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "qq ww ee rr")).toDF("doc_id", "text")
    val ppl = ArpaLm.score(docs, m, order = 3)
      .orderBy("doc_id").select("ppl").as[Double].collect()
    assert(ppl(0) < ppl(1))
  }

  test("layout-independent: identical model at 1 and 7 partitions") {
    val a = model.orderBy("order", "context", "word").collect()
    val b = ArpaLm.trainKneserNeyBigram(corpus.repartition(7))
      .orderBy("order", "context", "word").collect()
    assert(a === b)
  }
}
