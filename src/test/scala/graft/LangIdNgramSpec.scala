package graft

import graft.text.{LangIdNgram, TextAnalysis}
import org.apache.spark.sql.functions._

/** Cavnar–Trenkle rank-profile language ID: catches short/stopword-free
  * text the stopword heuristic cannot call, profile bounds, determinism.
  */
class LangIdNgramSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val train = Seq(
    ("en", "the quick brown fox jumps over the lazy dog and the children watch while they run through the green fields in the morning light she said that they would come home early because the weather was getting worse"),
    ("de", "der schnelle braune fuchs springt über den faulen hund während die kinder durch die grünen felder laufen sie sagte dass sie früh nach hause kommen würden weil das wetter schlechter wurde und niemand draußen bleiben wollte"),
    ("es", "el rápido zorro marrón salta sobre el perro perezoso mientras los niños corren por los campos verdes ella dijo que volverían temprano a casa porque el tiempo empeoraba y nadie quería quedarse fuera"),
    ("fr", "le renard brun rapide saute par dessus le chien paresseux pendant que les enfants courent dans les champs verts elle a dit que ils rentreraient tôt à la maison parce que le temps devenait mauvais"))
    .toDF("lang", "text")

  // short, stopword-free fragments: morphology/diacritics are the only
  // evidence — the case the rank-profile method exists for
  private lazy val probes = Seq(
    (1L, "wunderschönes mädchen läuft schneller", "de"),
    (2L, "niños pequeños corrían tempranito", "es"),
    (3L, "rentrant châteaux verts dessous", "fr"),
    (4L, "quickly jumping weather watchers", "en"))
    .toDF("doc_id", "text", "truth")

  test("classifies short stopword-free text the stopword heuristic calls 'und'") {
    val prof = LangIdNgram.profiles(train, profileSize = 100)
    val pred = LangIdNgram.classify(probes, prof, profileSize = 100)
      .join(probes, Seq("doc_id"))
      .select("doc_id", "pred_lang", "truth")
      .collect()
    assert(pred.length == 4)
    pred.foreach(r => assert(r.getString(1) == r.getString(2),
      s"doc ${r.getLong(0)}: predicted ${r.getString(1)}, truth ${r.getString(2)}"))
    // and the stopword heuristic fails on at least 3 of the 4 (returns
    // und or the wrong language) — the gap this operator closes
    val sw = probes.select(col("truth"), TextAnalysis.langId(col("text")).as("p"))
      .collect()
    assert(sw.count(r => r.getString(1) != r.getString(0)) >= 3,
      sw.map(r => s"${r.getString(0)}->${r.getString(1)}").mkString(", "))
  }

  test("charTrigrams: padding, ordering, and empty/short guards") {
    val rows = Seq((1L, "ab c"), (2L, ""), (3L, " "), (4L, "x"))
      .toDF("id", "t")
      .select(col("id"), LangIdNgram.normalized(col("t")).as("n"))
      .select(col("id"), LangIdNgram.charTrigrams(col("n")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // " ab c " → 4 trigrams in offset order
    assert(rows(1L) == Seq(" ab", "ab ", "b c", " c "))
    assert(rows(2L).isEmpty) // "" normalizes to "  " (len 2): no trigram
    assert(rows(3L).isEmpty)
    assert(rows(4L) == Seq(" x "))
  }

  test("profiles: bounded size, contiguous ranks, deterministic ties") {
    val prof = LangIdNgram.profiles(train, profileSize = 50).cache()
    val byLang = prof.groupBy("lang")
      .agg(count(lit(1)).as("n"), min("lrank").as("lo"), max("lrank").as("hi"))
      .collect()
    byLang.foreach { r =>
      assert(r.getLong(1) <= 50 && r.getLong(2) == 1L && r.getLong(3) == r.getLong(1))
    }
    // deterministic under input repartition
    val again = LangIdNgram.profiles(train.repartition(5), profileSize = 50)
    assert(prof.except(again).isEmpty && again.except(prof).isEmpty)
    prof.unpersist()
  }

  test("maxChars sample classification matches full-text on short docs; loud on <3") {
    val prof = LangIdNgram.profiles(train, profileSize = 100)
    val full = LangIdNgram.classify(probes, prof).orderBy("doc_id").collect().toSeq
    val sampled = LangIdNgram.classify(probes, prof, maxChars = 300)
      .orderBy("doc_id").collect().toSeq
    assert(full == sampled) // probes are shorter than the sample window
    intercept[IllegalArgumentException](
      LangIdNgram.classify(probes, prof, maxChars = 2))
  }

  test("classify: no-evidence docs yield no row; repartition-invariant") {
    val prof = LangIdNgram.profiles(train, profileSize = 100)
    val docs = Seq((1L, "läuft schnell"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = LangIdNgram.classify(docs, prof, profileSize = 100)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    val a = LangIdNgram.classify(probes, prof).orderBy("doc_id").collect().toSeq
    val b = LangIdNgram.classify(probes.repartition(7), prof).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
