package graft

import graft.text.ArpaLm
import org.apache.spark.sql.functions._

class ArpaLmSpec extends SparkTestBase {
  import spark.implicits._

  // a tiny but complete trigram model: every Katz branch reachable
  private val arpa = Seq(
    "\\data\\",
    "ngram 1=6",
    "ngram 2=4",
    "ngram 3=2",
    "",
    "\\1-grams:",
    "-99\t<s>\t-0.30103",
    "-1.0\t</s>",
    "-0.7\tthe\t-0.2",
    "-1.1\tcat\t-0.1",
    "-1.3\tsat\t-0.15",
    "-2.0\t<unk>",
    "",
    "\\2-grams:",
    "-0.5\t<s> the\t-0.25",
    "-0.6\tthe cat\t-0.2",
    "-0.9\tcat sat\t-0.3",
    "-1.2\tsat </s>",
    "",
    "\\3-grams:",
    "-0.4\t<s> the cat",
    "-0.8\tthe cat sat",
    "\\end\\")

  private def model = ArpaLm.parse(arpa.toDF("line"))

  test("parse: orders, contexts, probabilities, and default backoffs") {
    val rows = model.orderBy("order", "context", "word")
      .as[(Int, String, String, Double, Double)].collect()
    assert(rows.count(_._1 == 1) === 6)
    assert(rows.count(_._1 == 2) === 4)
    assert(rows.count(_._1 == 3) === 2)
    val theCat = rows.find(r => r._1 == 2 && r._2 == "the" && r._3 == "cat").get
    assert(theCat._4 === -0.6 && theCat._5 === -0.2)
    val satEos = rows.find(r => r._1 == 2 && r._2 == "sat" && r._3 == "</s>").get
    assert(satEos._5 === 0.0, "absent backoff field must default to 0")
    val tri = rows.find(r => r._1 == 3 && r._2 == "the cat" && r._3 == "sat").get
    assert(tri._4 === -0.8)
  }

  test("strict parse rejects torn files; lenient accepts them") {
    val torn = arpa.filterNot(_ == "-0.8\tthe cat sat")
    val e = intercept[IllegalArgumentException] {
      ArpaLm.parse(torn.toDF("line"))
    }
    assert(e.getMessage.contains("order 3: declared 2, parsed 1"))
    assert(ArpaLm.parse(torn.toDF("line"), strict = false).count() === 11)
    val notArpa = intercept[IllegalArgumentException] {
      ArpaLm.parse(Seq("-0.5\tword").toDF("line"))
    }
    assert(notArpa.getMessage.contains("not an ARPA file"))
  }

  test("malformed data lines fail loud, not silently null") {
    val bad = Seq("\\data\\", "ngram 1=1", "\\1-grams:", "-0.x\tword", "\\end\\")
    val e = intercept[Exception] {
      ArpaLm.parse(bad.toDF("line")).collect()
    }
    assert(e.getMessage.contains("unparseable log10p"))
  }

  test("tab-less and empty-field data lines get the DEDICATED error, not an ANSI index error") {
    def parseErr(line: String): String = intercept[Exception] {
      ArpaLm.parse(Seq("\\data\\", "ngram 1=1", "\\1-grams:", line, "\\end\\").toDF("line"))
        .collect()
    }.getMessage
    // space-separated (SRILM rejects these too) and torn bare-number lines
    assert(parseErr("-1.0 word -0.3").contains("needs 2 or 3 tab-separated fields"))
    assert(parseErr("-1.2").contains("needs 2 or 3 tab-separated fields"))
    // trailing tab / blank field / doubled separator: phantom '' words
    assert(parseErr("-1.0\t").contains("empty word"))
    assert(parseErr("-1.0\t  \t-0.3").contains("empty word"))
    assert(parseErr("-1.0\ta  b").contains("empty word"))
  }

  test("format rejects models its text form cannot represent") {
    val bad = Seq((1, "", "two words", -1.0, 0.0)).toDF("order", "context", "word", "log10p", "backoff")
    val e = intercept[IllegalArgumentException] { ArpaLm.format(bad) }
    assert(e.getMessage.contains("not representable"))
    val empty = Seq((1, "", "", -1.0, 0.0)).toDF("order", "context", "word", "log10p", "backoff")
    assert(intercept[IllegalArgumentException] { ArpaLm.format(empty) }
      .getMessage.contains("not representable"))
  }

  test("Katz cascade: hand-computed scores for every branch") {
    val docs = Seq(
      (1L, "the cat sat"), // all-trigram path after the <s> bigram
      (2L, "cat"), //         bigram miss -> bow + unigram paths
      (3L, "zebra") //        OOV -> <unk>
    ).toDF("doc_id", "text")
    val out = ArpaLm.score(docs, model, order = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect()

    // doc 1: positions the|<s>, cat|<s> the, sat|the cat, </s>|cat sat
    //   the|<s>: no trigram ctx, bigram "<s> the" = -0.5 (bow of 1-word
    //     ctx "<s>" as a 2-gram entry is absent -> 0)
    //   cat|<s> the: trigram "<s> the cat" = -0.4
    //   sat|the cat: trigram "the cat sat" = -0.8
    //   </s>|cat sat: no trigram; bow("cat sat") = -0.3 + p2(sat </s>) = -1.2
    val d1 = out(0)
    assert(d1._2 === 4L)
    assert(math.abs(d1._3 - (-0.5 + -0.4 + -0.8 + (-0.3 + -1.2))) < 1e-9, s"got ${d1._3}")

    // doc 2: cat|<s>: no "(<s>) cat" bigram -> bow(<s>) = -0.30103 + p1(cat) = -1.1
    //        </s>|<s> cat: no trigram, no "cat </s>" bigram ->
    //          bow("<s> cat") absent = 0, then bow(cat) = -0.1 + p1(</s>) = -1.0
    val d2 = out(1)
    assert(d2._2 === 2L)
    assert(math.abs(d2._3 - ((-0.30103 + -1.1) + (-0.1 + -1.0))) < 1e-9, s"got ${d2._3}")

    // doc 3: zebra -> <unk> = -2.0 after bow(<s>) = -0.30103;
    //        </s>|<s> zebra -> bow(zebra) absent = 0 + p1(</s>) = -1.0
    val d3 = out(2)
    assert(math.abs(d3._3 - ((-0.30103 + -2.0) + -1.0)) < 1e-9, s"got ${d3._3}")

    // ppl consistency: 10^(-sum/n)
    out.foreach { r =>
      assert(math.abs(r._4 - math.pow(10.0, -r._3 / r._2)) < 1e-9)
    }
  }

  test("fluent in-vocab text scores better (lower ppl) than OOV soup") {
    val docs = Seq((1L, "the cat sat"), (2L, "qq ww ee rr tt yy")).toDF("doc_id", "text")
    val ppl = ArpaLm.score(docs, model, order = 3)
      .orderBy("doc_id").select("ppl").as[Double].collect()
    assert(ppl(0) < ppl(1))
  }

  test("without <unk>, OOV scores at the unkLog10p floor") {
    val noUnk = model.filter(!(col("order") === 1 && col("word") === "<unk>"))
    val docs = Seq((1L, "zebra")).toDF("doc_id", "text")
    val sum = ArpaLm.score(docs, noUnk, order = 3, unkLog10p = -7.0)
      .select("log10p_sum").as[Double].head()
    assert(math.abs(sum - ((-0.30103 + -7.0) + -1.0)) < 1e-9, s"got $sum")
  }

  test("order=1 degenerates to the unigram model (no context joins)") {
    val docs = Seq((1L, "the cat")).toDF("doc_id", "text")
    val sum = ArpaLm.score(docs, model, order = 1)
      .select("log10p_sum").as[Double].head()
    assert(math.abs(sum - (-0.7 + -1.1 + -1.0)) < 1e-9, s"got $sum")
  }

  test("empty text scores exactly the </s> position") {
    val docs = Seq((1L, "")).toDF("doc_id", "text")
    val out = ArpaLm.score(docs, model, order = 3)
      .as[(Long, Long, Double, Double)].head()
    // tokens("") is [""]: one OOV position then </s> — the documented
    // tokenizer-family convention for empty docs
    assert(out._2 === 2L)
  }
}
