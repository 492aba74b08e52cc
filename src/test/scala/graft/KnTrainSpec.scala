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

  test("layout-independent: identical model at 1 and 7 partitions") {
    val a = model.orderBy("order", "context", "word").collect()
    val b = ArpaLm.trainKneserNeyBigram(corpus.repartition(7))
      .orderBy("order", "context", "word").collect()
    assert(a === b)
  }
}
