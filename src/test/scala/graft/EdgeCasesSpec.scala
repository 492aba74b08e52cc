package graft

import graft.dedup.Dedup
import graft.functions.vec
import org.apache.spark.sql.functions._

/** Pins edge-case behavior of the custom expressions: empty inputs, nulls,
  * degenerate vectors, truncated binaries, skewed LSH buckets.
  */
class EdgeCasesSpec extends SparkTestBase {
  import spark.implicits._

  test("mixEpochs: exact integer accounting; missing weighted source raises") {
    val docs = Seq(
      (1L, "a", "one two three four"),   // 4 tokens
      (2L, "a", "five six"),             // 2 tokens
      (3L, "b", "seven eight nine"))     // 3 tokens
      .toDF("doc_id", "source", "text")
    val w = Seq(("a", 3L), ("b", 1L)).toDF("source", "weight")
    val out = graft.ops.Sampling.mixEpochs(docs, w, budget = 100L)
      .orderBy("source")
      .select("source", "n_tokens", "tokens_drawn", "epochs")
      .as[(String, Long, Long, Double)].collect().toSeq
    // a: floor(3*100/4)=75 drawn over 6 avail -> 12.5 epochs; b: 25/3 -> 8.3333
    assert(out === Seq(("a", 6L, 75L, 12.5), ("b", 3L, 25L, 8.3333)))
    val e = intercept[IllegalArgumentException] {
      graft.ops.Sampling.mixEpochs(docs,
        Seq(("a", 1L), ("zz", 1L)).toDF("source", "weight"), budget = 10L)
    }
    assert(e.getMessage.contains("absent from the corpus"))
  }

  test("blocklistHits: word boundaries, case-insensitivity, metachar rejection") {
    import graft.text.TextAnalysis
    val d = Seq(
      (1L, "clean text here"),
      (2L, "some Contraband found"),
      (3L, "contrabands is a superstring"),   // \b must NOT match inside
      (4L, "VERBOTEN and verboten twice"))
      .toDF("doc_id", "text")
    val hits = d.select($"doc_id",
        TextAnalysis.blocklistHits($"text", Seq("contraband", "verboten")).as("n"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(hits === Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 2L)))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.blocklistPattern(Seq("bad.*word"))
    }
    assert(e.getMessage.contains("letters/digits/hyphens"))
    // non-ASCII rejected: Java (?i) folds ASCII case only, RE2 folds
    // Unicode — a non-ASCII word would silently diverge between engines
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.blocklistPattern(Seq("münchen"))
    }
    assert(e2.getMessage.contains("ASCII"))
    // edge hyphens rejected: \b beyond the hyphen demands a word char,
    // so the word could never match
    val e3 = intercept[IllegalArgumentException] {
      TextAnalysis.blocklistPattern(Seq("foo-"))
    }
    assert(e3.getMessage.contains("edge hyphen"))
    // interior hyphen stays legal
    assert(TextAnalysis.blocklistPattern(Seq("foo-bar")).contains("foo-bar"))
  }

  test("distances: empty arrays give 0 (euclid/manhattan) and NaN (cosine, 0/0)") {
    val df = Seq((Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
    val (e, m, c) = df.select(
        vec.distEuclidean($"a", $"b"), vec.distManhattan($"a", $"b"), vec.distCosine($"a", $"b"))
      .as[(Double, Double, Double)].head()
    assert(e === 0.0 && m === 0.0)
    assert(c.isNaN) // matches reference semantics: 1 - 0/(0*0)
  }

  test("null vector input yields null distance (nullIntolerant)") {
    val df = Seq((Some(Seq(1f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val r = df.select(vec.distEuclidean($"a", $"b")).collect().head
    assert(r.isNullAt(0))
  }

  test("mismatched lengths use the common prefix (reference loops over len(a))") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("a", "b")
    assert(df.select(vec.distEuclidean($"a", $"b")).as[Double].head() === 0.0)
  }

  test("vec_from_bytes ignores trailing bytes shorter than one float") {
    val df = Seq(Tuple1(Array[Byte](0x3f, 0x80.toByte, 0, 0, 0x7f))).toDF("b")
    val v = df.select(vec.fromBytes($"b")).as[Seq[Float]].head()
    assert(v === Seq(1.0f))
  }

  test("shingle/text kernels survive empty and whitespace-only text") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("doc_id", "text")
    val sh = df.orderBy("doc_id").select(Dedup.hashedShingleSet(Dedup.shingles($"text")))
      .as[Seq[Long]].collect()
    assert(sh.forall(_.nonEmpty)) // degenerate docs hash their joined tokens
    val stats = df.orderBy("doc_id").select(graft.internal.SqlBridge.column(
        graft.functions.TextStats(graft.internal.SqlBridge.expression($"text"))))
      .collect()
    assert(stats.length === 3) // no crash; counters well-defined
  }

  test("LSH bucket cap star-pairs pathological buckets and keeps small dup classes") {
    val boiler = (0L until 60L).map(i => (i, "the same boilerplate text repeated again and again here"))
    val pair = Seq((100L, "unique alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "xx unique alpha beta gamma delta epsilon zeta eta theta"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")

    val uncapped = Dedup.minhashLshPairs(docs, threshold = 0.5, maxBucketSize = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(uncapped.length >= 60 * 59 / 2) // boilerplate class fully paired

    val capped = Dedup.minhashLshPairs(docs, threshold = 0.5, maxBucketSize = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((100L, 101L)), "small dup class must survive the cap")
    val boilerPairs = capped.filter(p => p._1 < 60L && p._2 < 60L)
    assert(boilerPairs === (1L until 60L).map(i => (0L, i)).toSet,
      "pathological bucket must collapse to n-1 star pairs through the representative")
  }

  test("NibbleHistogram: empty payload, covered clamped to payload length, negative covered") {
    val rows = Seq(
      (1L, Array.empty[Byte], 4),
      (2L, Array[Byte](0x00, 0xF0.toByte), 100), // covered > length → clamp
      (3L, Array[Byte](0x10, 0x20), -1))         // negative → empty histogram
      .toDF("id", "payload", "covered")
    val h = rows.orderBy("id").select(graft.internal.SqlBridge.column(
        graft.functions.NibbleHistogram(
          graft.internal.SqlBridge.expression(col("payload")),
          graft.internal.SqlBridge.expression(col("covered")))))
      .as[Seq[Long]].collect()
    assert(h(0).sum === 0L)
    assert(h(1)(0) === 1L && h(1)(15) === 1L && h(1).sum === 2L)
    assert(h(2).sum === 0L)
  }

  test("c4 line cleaning: each rule fires, empty text survives, flagged pages keep nothing") {
    import spark.implicits._
    val rows = Seq(
      (1L, "Good sentence with three words.\nno terminal punct\nTwo words.\nenable JavaScript now please.\nAnother keeper line here!"),
      (2L, "Contains lorem ipsum filler.\nGood sentence with three words."),
      (3L, "code { leaks }\nGood sentence with three words."),
      (4L, ""),
      (5L, "   \n\t.")).toDF("doc_id", "text")
      .select(col("doc_id"), graft.text.TextAnalysis.c4CleanLines(col("text")).as("c"))
      .select(col("doc_id"), col("c.clean_text"), col("c.n_kept"), col("c.n_dropped"), col("c.page_dropped"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows(1L) == (("Good sentence with three words.\nAnother keeper line here!", 2L, 3L, 0L)))
    assert(rows(2L) == (("", 0L, 2L, 1L))) // lorem ipsum page-drop
    assert(rows(3L) == (("", 0L, 2L, 1L))) // curly-brace page-drop
    assert(rows(4L) == (("", 0L, 1L, 0L))) // empty text: one empty line, dropped, page kept
    assert(rows(5L) == (("", 0L, 2L, 0L))) // whitespace + lone punctuation: too few words
  }

  test("markup extraction: scripts/styles/comments vanish, blocks keep lines, entities decode, plain text passes through") {
    import spark.implicits._
    val rows = Seq(
      (1L, "<html><head><style>p{x:1}</style><script>if (a < b && c > 1) { go(\"x\"); }</script></head>" +
        "<body><!-- note --><h1>Title &amp; more</h1><p>Body line one.</p><ul><li>item</li></ul>" +
        "<br/>Tom &lt;3 &quot;q&quot;&nbsp;end</body></html>"),
      (2L, "plain  text,   no markup"),      // pass-through: only space collapse
      (3L, ""),                              // empty survives
      (4L, "a &amp;lt; b"))                  // &amp; decodes LAST: author wrote literal &lt;
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.text.TextAnalysis.extractMarkup(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == "Title & more\nBody line one.\nitem\nTom <3 \"q\" end")
    assert(rows(2L) == "plain text, no markup")
    assert(rows(3L) == "")
    assert(rows(4L) == "a &lt; b")
  }

  test("link extraction: quoted and bare URLs, case-folded domains, trailing punctuation trimmed") {
    import spark.implicits._
    val rows = Seq(
      (1L, "no urls here"),
      (2L, "go to <a href=\"https://A.example.com/x\">x</a> or https://b.example.com/y?z=1."),
      (3L, "ftp://not.matched and https://\nbroken"), // scheme filter + newline stops the match
      (4L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.text.TextAnalysis.links(col("text")).as("links"))
      .select(col("doc_id"), size(col("links")).as("n"),
        array_join(array_sort(graft.text.TextAnalysis.linkDomains(col("links"))), ",").as("doms"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(rows(1L) == ((0, "")))
    assert(rows(2L) == ((2, "a.example.com,b.example.com")))
    assert(rows(3L) == ((0, ""))) // non-http scheme skipped; "https://" + newline never matches
    assert(rows(4L) == ((0, "")))
  }

  test("markup extraction fuzz: 300 random atom sequences uphold the output invariants") {
    import spark.implicits._
    // no &lt;/&gt; atoms, so NO '<' or '>' may survive extraction; script/
    // style/comment content must vanish; whitespace must be normalized
    val atoms = Vector("alpha", "beta", "gamma", " ", " ", "\n", "\t",
      "<p>", "</p>", "<div class=\"x\">", "</div>", "<br/>", "<h1>", "</h1>",
      "<li>", "</li>", "<script>var zz < 1;</script>", "<style>p{zz:0}</style>",
      "<!-- zzhidden -->", "&amp;", "&nbsp;", "&quot;", "&#39;",
      "<a href=\"https://x.example/y\">", "</a>")
    val rnd = new scala.util.Random(42)
    val docs = (0L until 300L).map { i =>
      (i, (0 until 1 + rnd.nextInt(30)).map(_ => atoms(rnd.nextInt(atoms.length))).mkString)
    }
    val out = docs.toDF("doc_id", "text")
      .select(col("doc_id"), graft.text.TextAnalysis.extractMarkup(col("text")).as("t"))
      .as[(Long, String)].collect()
    assert(out.length == 300)
    out.foreach { case (id, t) =>
      def bad(why: String) = fail(s"doc $id violates '$why': ${t.take(120)}")
      if (t.contains("<") || t.contains(">")) bad("no angle brackets")
      if (t.contains("zz")) bad("script/style/comment content stripped")
      if (t.contains("\t") || t.contains("  ") || t.contains("\n\n") ||
        t.contains(" \n") || t.contains("\n ")) bad("normalized whitespace")
      if (t != t.trim) bad("trimmed ends")
    }
  }

  test("repetition ratio survives empty / whitespace-only / single-token text") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one"), (4L, "a a")).toDF("doc_id", "text")
    val r = df.orderBy("doc_id")
      .select(graft.text.TextAnalysis.repetitionRatio($"text")).as[Double].collect()
    assert(r.toSeq === Seq(0.0, 0.0, 0.0, 0.0)) // all under 3 tokens: one degenerate shingle
  }

  test("searchExactCosine excludes zero vectors even when true neighbors are far (cos > 0.5)") {
    // all real neighbors OPPOSE the query (cosine distance ≈ 2 > 0.5): a
    // zero vector passed through normalization would rank at reduced-L2
    // 1.0 and displace them — exclusion must keep the exact top-k intact
    val rows = (0L until 20L).map(i => (i, Array(-(i.toFloat + 1), -1f, 0f))) :+ (99L, Array(0f, 0f, 0f))
    val df = rows.toDF("id", "vector")
    val queries = Array((0L, Array(1f, 1f, 0f)))
    val res = graft.knn.Quantize.searchExactCosine(spark, df, queries, k = 5).collect()
    assert(res.length === 5)
    assert(!res.map(_.getLong(1)).contains(99L), "zero vector must be excluded")
    val exact = graft.knn.Knn.bruteForce(df.filter($"id" =!= 99L), queries.toSeq.toDF("qid", "qvec"), 5, "cosine")
      .select("qid", "id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._3)
    assert(res.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(_._3).toSeq === exact.toSeq)
  }

  test("WAV decoder rejects non-PCM and truncated payloads without throwing") {
    val wav = graft.multimodal.Multimodal.encodeWav(Array.tabulate(32)(_.toShort), 8000)
    // truncate mid-header and mid-data
    assert(graft.multimodal.Multimodal.WavDecoder.decodePcm(wav.take(10)).isEmpty)
    val mid = graft.multimodal.Multimodal.WavDecoder.decodePcm(wav.take(wav.length - 7))
    // mid-data truncation either fails or returns fewer samples — never throws
    assert(mid.forall(_._1.length <= 32))
    assert(graft.multimodal.Multimodal.WavDecoder.decodePcm("RIFFjunk".getBytes).isEmpty)
  }

  test("ivfMaintainedState on a never-written maintenance dir fails loudly, not silently empty") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_never").toString
    intercept[Exception](
      graft.streaming.StreamingOps.ivfMaintainedState(spark, dir).collect())
  }

  test("quota sampling keeps exactly quota rows per group, layout-independent") {
    val df = (0L until 200L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    def run(parts: Int) = graft.ops.Sampling.sampleQuota(df.repartition(parts), "doc_id", "source", 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val a = run(3)
    assert(a.length === 40) // 4 groups x quota 10
    assert(a === run(7), "survivor set must not depend on partition layout")
    // quota above group size keeps everything
    assert(graft.ops.Sampling.sampleQuota(df, "doc_id", "source", 100).count() === 200)
  }

  test("temperature sampling flattens source shares; alpha=1 keeps natural proportions") {
    // skewed corpus: 1000 head rows, 100 tail rows
    val df = ((0L until 1000L).map(i => (i, "head")) ++ (1000L until 1100L).map(i => (i, "tail")))
      .toDF("doc_id", "source")
    val flat = graft.ops.Sampling.sampleTemperature(df, "doc_id", "source",
        alpha = 0.3, targetFraction = 0.5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // alpha << 1 upweights the tail: its KEEP RATE must exceed the head's
    assert(flat("tail").toDouble / 100 > flat("head").toDouble / 1000)
    // alpha = 1: p_i proportional to n_i => every source keeps ~targetFraction
    val nat = graft.ops.Sampling.sampleTemperature(df, "doc_id", "source",
        alpha = 1.0, targetFraction = 0.5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(math.abs(nat("head").toDouble / 1000 - 0.5) < 0.1)
    assert(math.abs(nat("tail").toDouble / 100 - 0.5) < 0.2)
    // deterministic across layouts
    def ids(parts: Int) = graft.ops.Sampling.sampleTemperature(df.repartition(parts),
      "doc_id", "source", alpha = 0.3, targetFraction = 0.5).select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids(3) === ids(7))
  }

  test("token-budget sampling: maximal prefix under budget, single-window equivalence, layouts agree") {
    // doc i has (i % 7) + 1 tokens; two sources
    val df = (0L until 400L).map { i =>
      (i, s"src${i % 2}", (0L to i % 7).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val budgets = Map("src0" -> 300L, "src1" -> 0L)
    val got = graft.ops.Sampling.sampleTokenBudget(df, "doc_id", "source", "text", budgets)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // reference: the one-window formulation over (bucket, id) rank
    val b = graft.ops.Sampling.bucket(col("doc_id"), "s")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(b, col("doc_id"))
    val want = df.withColumn("__tok", size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("__cum", sum("__tok").over(w))
      .filter(col("source") === "src0" && col("__cum") - col("__tok") < 300L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty, "degenerate fixture: budget kept nothing")
    // kept tokens reach the budget but never exceed it by a full doc
    val keptToks = df.filter(col("doc_id").isin(got: _*))
      .select(size(split(trim(col("text")), "\\s+")).cast("long")).as[Long].collect().sum
    assert(keptToks >= 300L - 7 && keptToks < 300L + 7,
      s"kept $keptToks tokens against a 300-token budget")
    // zero budget keeps nothing; absent sources are dropped
    assert(!got.exists(_ % 2 === 1))
    // layout-independent
    val again = graft.ops.Sampling.sampleTokenBudget(df.repartition(7), "doc_id",
      "source", "text", budgets).select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === got)
    // budget >= source total keeps the whole source
    val all = graft.ops.Sampling.sampleTokenBudget(df, "doc_id", "source", "text",
      Map("src0" -> 1000000L)).count()
    assert(all === 200L)
    // the DataFrame-budgets (high-cardinality) form keeps the same set
    val budgetsDf = Seq(("src0", 300L), ("src1", 0L)).toDF("source", "budget")
    val gotDf = graft.ops.Sampling.sampleTokenBudgetDF(df, budgetsDf,
      "doc_id", "source", "text").select("doc_id").as[Long].collect().sorted.toSeq
    assert(gotDf === got)
  }

  test("dsir weights: target-typical docs score above corpus-typical docs; counts smoothed") {
    import graft.text.TextAnalysis
    val corpus = Seq(
      (1L, "alpha beta alpha beta"),   // pure target language
      (2L, "gamma delta gamma delta"), // pure background language
      (3L, "alpha delta")).toDF("doc_id", "text")
    val target = Seq((99L, "alpha beta alpha alpha beta")).toDF("doc_id", "text")
    val w = TextAnalysis.dsirWeights(corpus, target)
      .select("doc_id", "dsir_weight").as[(Long, Double)].collect().toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L),
      s"expected target-like > mixed > background, got $w")
    // background tokens never seen in target still get finite (smoothed) scores
    assert(!w.values.exists(_.isInfinite))
    // n_tokens counts running tokens
    val nt = TextAnalysis.dsirWeights(corpus, target)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(nt === Map(1L -> 4L, 2L -> 4L, 3L -> 2L))
  }

  test("pii redaction replaces emails then phone runs; clean text passes through") {
    import graft.text.TextAnalysis
    val df = Seq(
      (1L, "mail me at first.last+tag@sub.example.co.uk thanks"),
      (2L, "call +1 (650) 555-0199 or 020 7946 0958 now"),
      (3L, "no pii in this document at all"),
      (4L, "user9@example.org and +44 7700 900123 together")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("r"),
        TextAnalysis.piiCounts(col("text")).head._2.as("ne"),
        TextAnalysis.piiCounts(col("text"))(1)._2.as("np"))
      .as[(Long, String, Int, Int)].collect().sortBy(_._1)
    assert(out(0)._2 === "mail me at <EMAIL> thanks" && out(0)._3 === 1 && out(0)._4 === 0)
    assert(out(1)._2 === "call <PHONE> or <PHONE> now" && out(1)._3 === 0 && out(1)._4 === 2)
    assert(out(2)._2 === "no pii in this document at all" && out(2)._3 === 0 && out(2)._4 === 0)
    assert(out(3)._2 === "<EMAIL> and <PHONE> together" && out(3)._3 === 1 && out(3)._4 === 1)
  }

  test("TopK with k=0 accepts pushes and stays empty") {
    val t = new graft.knn.TopK(0)
    t.push(1.0, 1L)
    assert(t.size === 0 && t.sorted.isEmpty)
  }

  test("OPQ on zero-variance data: orthonormal rotation, no crash, isometry holds") {
    // constant vectors → zero covariance → Jacobi on the zero matrix; the
    // MinEig clamp keeps the allocation objective finite and the basis
    // stays orthonormal (any orthonormal basis diagonalizes 0)
    val const = (0L until 50L).map(i => (i, Array.fill(8)(2.5f))).toDF("id", "vector")
    val model = graft.knn.Opq.train(const, m = 4)
    for (i <- model.rotation.indices; j <- i until model.rotation.length) {
      val expect = if (i == j) 1.0 else 0.0
      val d = model.rotation(i).zip(model.rotation(j)).map { case (x, y) => x * y }.sum
      assert(math.abs(d - expect) < 1e-9)
    }
    // rotating the constant corpus yields constant (all-equal) outputs
    val rotated = graft.knn.Opq.rotate(const, model)
      .select("vector").as[Array[Float]].collect()
    assert(rotated.forall(v => v.zip(rotated.head).forall { case (a, b) => math.abs(a - b) < 1e-5f }))
  }

  test("probe sequence: budget beyond 2^n drains to exactly 2^n distinct probes") {
    val all = graft.dedup.Dedup.probeSequence(5L, Array(0.3, 0.1), probes = 100)
    assert(all.length === 4 && all.toSet.size === 4 && all.head === 5L)
  }

  test("radius search: r=0 returns exact self-matches only") {
    val data = (0L until 20L).map(i => (i, Array(i.toFloat, 1f))).toDF("id", "vector")
    val queries = Seq((0L, Array(3f, 1f))).toDF("qid", "qvec")
    val hits = graft.knn.Knn.radius(data, queries, r = 0.0)
      .select("id").as[Long].collect()
    assert(hits.toSeq === Seq(3L))
  }

  test("near-dup sink: first batch empty, later batch still pairs against nothing silently lost") {
    val dir = java.nio.file.Files.createTempDirectory("neardup_sink_edge").toString
    val sink = graft.streaming.StreamingOps.nearDupSink(spark, dir, threshold = 0.8)
    sink(Seq.empty[(Long, String)].toDF("doc_id", "text"), 0L)
    val text = (0 until 40).map(t => s"tok$t").mkString(" ")
    sink(Seq((1L, text), (2L, text)).toDF("doc_id", "text"), 1L)
    val pairs = graft.streaming.StreamingOps.nearDupSinkPairs(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("APNG: single-pixel frames round-trip; encodeApng refuses zero frames") {
    val apng = graft.multimodal.Multimodal.encodeApng(
      Seq(Array[Byte](1, 2, 3), Array[Byte](40, 50, 60)), 1, 1)
    val frames = graft.multimodal.Multimodal.ApngDecoder.decodeFrames(apng, 4)
    assert(frames.length === 2)
    assert(frames(0).toSeq === Seq[Byte](1, 2, 3) && frames(1).toSeq === Seq[Byte](40, 50, 60))
    intercept[IllegalArgumentException] {
      graft.multimodal.Multimodal.encodeApng(Seq.empty, 1, 1)
    }
  }

  test("session_window semantics: exact-gap events MERGE; beyond-gap events split") {
    val df = Seq(0L, 10L, 19L, 30L)
      .map(s => (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)), 1.0))
      .toDF("user_id", "ts", "value")
    val s = graft.streaming.StreamingOps.sessionizedEventStats(df, "10 seconds")
      .select("n_events").as[Long].collect().sorted.toSeq
    // 0→10 is exactly the gap: merges (same `> gap` split rule as the
    // batch Temporal.sessionize, which the stream_sessionize oracle
    // encodes); 19→30 exceeds it: splits
    assert(s === Seq(1L, 3L))
  }

  test("canonical URL: every rule fires, non-default ports and path case survive") {
    val cases = Seq(
      "https://Example.com:443/Article/3?utm_source=feed&id=7&utm_medium=rss#frag"
        -> "https://example.com/Article/3?id=7",
      "https://www.example.com/Article/3?id=7" -> "https://example.com/Article/3?id=7",
      "http://example.com:80/other?gclid=xyz." -> "http://example.com/other",
      "https://a.com/" -> "https://a.com",
      "HTTPS://A.COM/PathCase" -> "https://a.com/PathCase",
      "https://a.com:8080/x" -> "https://a.com:8080/x", // non-default port kept
      "https://a.com/x?utm_a=1&utm_b=2&c=3" -> "https://a.com/x?c=3",
      "https://a.com/x?a=1&utm_z=9" -> "https://a.com/x?a=1")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), graft.text.TextAnalysis.canonicalUrl(col("url")).as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (in, want) => assert(got(in) === want, s"for $in") }
  }

  test("weighted sampling: matches the A-Res closed form, is layout-invariant, rejects bad weights") {
    val df = (1L to 400L).map(i => (i, (i % 7 + 1).toDouble)).toDF("doc_id", "w")
    // recompute the Efraimidis–Spirakis keys exactly as the operator does
    def key(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md.take(15), 16).toDouble
      math.log((h + 0.5) / math.pow(2, 60)) / w
    }
    val expect = (1L to 400L).map(i => (i, key(i, (i % 7 + 1).toDouble)))
      .sortBy { case (id, k) => (-k, id) }.take(50).map(_._1)
    def got(parts: Int) = graft.ops.Sampling
      .sampleWeighted(df.repartition(parts), "doc_id", "w", k = 50)
      .orderBy("sample_rank").select("doc_id").as[Long].collect().toSeq
    assert(got(3) === expect)
    assert(got(11) === expect) // pure function of ids, not layout
    val ex = intercept[Exception] {
      graft.ops.Sampling.sampleWeighted(
        Seq((1L, 0.0)).toDF("doc_id", "w"), "doc_id", "w", k = 1).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("non-positive or NaN weight")))
    // NaN must raise too — NaN <= 0 is false, and a NaN key would sort
    // above every real key, silently hijacking the sample
    val exNan = intercept[Exception] {
      graft.ops.Sampling.sampleWeighted(
        Seq((1L, Double.NaN)).toDF("doc_id", "w"), "doc_id", "w", k = 1).count()
    }
    assert(messages(exNan).exists(_.contains("non-positive or NaN weight")))
    // the large-k approxQuantile pre-filter path (forced via
    // prefilterAbove = 1) selects the IDENTICAL set in the identical
    // order — the threshold only discards rows strictly below the k-th key
    val pre = graft.ops.Sampling
      .sampleWeighted(df.repartition(5), "doc_id", "w", k = 50, prefilterAbove = 1)
      .orderBy("sample_rank").select("doc_id").as[Long].collect().toSeq
    assert(pre === expect)
    // k >= total rows through the pre-filter path: everything survives
    val all = graft.ops.Sampling
      .sampleWeighted(df, "doc_id", "w", k = 500, prefilterAbove = 1)
    assert(all.count() === 400L)
  }

  test("hard negatives: the annulus filter excludes self and near-dups, keeps the nearest negative") {
    // anchor (1,0); exact dup id=2; near-dup id=3 (same direction); the
    // nearest legitimate negative is id=4 at 90°, then id=5 at 180°
    val data = Seq(
      (2L, Seq(1f, 0f)), (3L, Seq(2f, 0.001f)),
      (4L, Seq(0f, 1f)), (5L, Seq(-1f, 0f))).toDF("id", "vector")
    val q = Seq((1L, Seq(1f, 0f))).toDF("qid", "qvec")
    val got = graft.knn.Knn.hardNegatives(data, q, k = 5, minDist = 0.5, metric = "cosine")
      .select("id", "rank").as[(Long, Long)].collect().toSet
    assert(got === Set((4L, 1L), (5L, 2L))) // 2 and 3 are inside the dup band
  }
}
