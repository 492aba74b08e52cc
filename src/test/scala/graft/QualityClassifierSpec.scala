package graft

import graft.text.QualityClassifier
import org.apache.spark.sql.functions._

/** Deterministic logistic-regression quality stage: separation the single
  * heuristics misrank, exact determinism, loud degenerate args.
  */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // (label, rep3, digit, symbol): positives are clean-but-sometimes-
  // repetitive; negatives are digit/symbol spam with LOW repetition —
  // so the rep3 heuristic alone ranks them backwards
  private lazy val trainRows = Seq(
    (1.0, 0.35, 0.01, 0.02), (1.0, 0.40, 0.00, 0.01), (1.0, 0.30, 0.02, 0.00),
    (1.0, 0.25, 0.01, 0.03), (1.0, 0.45, 0.00, 0.02), (1.0, 0.38, 0.01, 0.01),
    (0.0, 0.05, 0.30, 0.40), (0.0, 0.02, 0.25, 0.50), (0.0, 0.08, 0.35, 0.30),
    (0.0, 0.04, 0.28, 0.45), (0.0, 0.06, 0.32, 0.35), (0.0, 0.03, 0.27, 0.42))
    .toDF("label", "rep3", "digit", "symbol")

  test("separates spam the repetition heuristic misranks") {
    val w = QualityClassifier.train(trainRows, "label", Seq("rep3", "digit", "symbol"),
      iters = 50, lr = 2.0)
    assert(w.length == 4)
    // probe: repetitive-but-clean vs low-repetition spam
    val probes = Seq(("clean_repetitive", 0.42, 0.01, 0.02),
      ("low_rep_spam", 0.03, 0.30, 0.45)).toDF("name", "rep3", "digit", "symbol")
    val s = probes.select(col("name"),
        QualityClassifier.scoreCol(Seq(col("rep3"), col("digit"), col("symbol")), w).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // rep3 alone ranks clean_repetitive WORSE (0.42 > 0.03); the trained
    // classifier ranks it clearly better
    assert(s("clean_repetitive") > s("low_rep_spam") + 0.2,
      s"scores: $s")
  }

  test("weights are exactly deterministic under input repartition") {
    val a = QualityClassifier.train(trainRows, "label", Seq("rep3", "digit", "symbol"))
    val b = QualityClassifier.train(trainRows.repartition(7), "label",
      Seq("rep3", "digit", "symbol"))
    assert(a.toSeq == b.toSeq)
  }

  test("degenerate parameters fail loudly") {
    intercept[IllegalArgumentException](
      QualityClassifier.train(trainRows, "label", Seq.empty))
    intercept[IllegalArgumentException](
      QualityClassifier.train(trainRows, "label", Seq("rep3"), iters = 0))
    intercept[IllegalArgumentException](
      QualityClassifier.train(trainRows, "label", Seq("rep3"), lr = 0.0))
    intercept[IllegalArgumentException](
      QualityClassifier.scoreCol(Seq(col("rep3")), Array(0.0, 1.0, 2.0)))
  }
}
