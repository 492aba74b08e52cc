package graft

import graft.text.ArpaLm
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the ARPA interchange layer: for ANY model
  * table the generator can produce, parse(format(m)) == m — probabilities
  * and backoffs round-trip bit-exactly (format writes exact decimal
  * expansions), section structure is regenerated from scratch, and a
  * formatted file with a line torn out always fails the strict count
  * check.
  */
object ArpaLmProps extends Properties("ArpaLm") {

  private lazy val spark = SparkTestBase.session

  private val word: Gen[String] = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(8)),
    Gen.oneOf("<s>", "</s>", "<unk>", "don't", "x.y", "a-b"))

  private val prob: Gen[Double] = Gen.oneOf(
    Gen.choose(-100.0, 0.0),
    Gen.const(-99.0),
    Gen.const(Double.NegativeInfinity))

  // 0.0 weighted in (the format's omitted-field convention); -0.0 and
  // NaN excluded: -0.0 is unrepresentable in the omitted-field form and
  // NaN is not a probability
  private val backoff: Gen[Double] =
    Gen.oneOf(Gen.const(0.0), Gen.choose(-10.0, 0.0).suchThat(_ != -0.0))

  private def ngram(order: Int): Gen[(Int, String, String, Double, Double)] =
    for {
      ws <- Gen.listOfN(order, word)
      lp <- prob
      bo <- backoff
    } yield (order, ws.init.mkString(" "), ws.last, lp, bo)

  private val model: Gen[List[(Int, String, String, Double, Double)]] =
    for {
      n1 <- Gen.choose(1, 8)
      n2 <- Gen.choose(0, 8)
      n3 <- Gen.choose(0, 8)
      u <- Gen.listOfN(n1, ngram(1))
      b <- Gen.listOfN(n2, ngram(2))
      t <- Gen.listOfN(n3, ngram(3))
    } yield u ++ b ++ t

  private def toDf(m: List[(Int, String, String, Double, Double)]) = {
    val sp = spark
    import sp.implicits._
    m.toDF("order", "context", "word", "log10p", "backoff")
  }

  private def canon(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(r => (r._1, r._2, r._3, r._4, r._5))

  property("parse(format(m)) == m, bit-exact, for arbitrary models") =
    forAll(model) { m =>
      val sp = spark
      import sp.implicits._
      val df = toDf(m)
      val back = ArpaLm.parse(ArpaLm.format(df).toDF("line"))
      canon(back.collect()).sameElements(canon(df.collect()))
    }

  property("tearing any data line out of a formatted model fails the strict count check") =
    forAll(model, Gen.choose(0, 1000)) { (m, seed) =>
      val lines = ArpaLm.format(toDf(m))
      val dataIdx = lines.zipWithIndex.filter(_._1.contains("\t")).map(_._2)
      val torn = lines.patch(dataIdx(seed % dataIdx.length), Nil, 1)
      val sp = spark
      import sp.implicits._
      try { ArpaLm.parse(torn.toDF("line")); false }
      catch { case e: IllegalArgumentException => e.getMessage.contains("counts disagree") }
    }
}
