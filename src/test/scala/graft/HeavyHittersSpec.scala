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

  test("short candidate list with err > 0 fails loudly (untracked could fill ranks)") {
    // Two partitions, each with exactly m=8 distinct grams (no in-partition
    // decrements), 3 heavies shared + 5 partition-local uniforms. The merge
    // truncation subtracts the 9th-largest value (10), leaving only the 3
    // heavies with err = 10 — so a top-5 request has 3 survivors and a
    // nonzero bound: untracked grams with true counts in [1, 10] could own
    // ranks 4-5. Must throw, not silently return 3 rows.
    def doc(g: String) = s"$g $g $g" // one 3-gram per doc
    val p1 = Seq.fill(50)(doc("h1")) ++ Seq.fill(50)(doc("h2")) ++ Seq.fill(50)(doc("h3")) ++
      (1 to 5).flatMap(i => Seq.fill(10)(doc(s"a$i")))
    val p2 = Seq.fill(50)(doc("h1")) ++ Seq.fill(50)(doc("h2")) ++ Seq.fill(50)(doc("h3")) ++
      (1 to 5).flatMap(i => Seq.fill(10)(doc(s"b$i")))
    val docs = spark.sparkContext.parallelize(
      (p1 ++ p2).zipWithIndex.map { case (t, i) => (i.toLong, t) }, 2)
      .toDF("doc_id", "text")
    val e = intercept[Exception](HeavyHitters.ngramTopK(docs, n = 3, k = 5, m = 8).collect())
    assert(e.getMessage.contains("not provable"), e.getMessage)
  }

  test("ngramTopKByGroup equals the plain per-group exact count (generous m)") {
    val docs = (0 until 300).map { i =>
      val grp = s"src${i % 3}"
      val filler = (0 until 5).map(j => s"x${unit(i.toLong * 17 + j) * 40 % 40}".take(4)).mkString(" ")
      (i.toLong, grp, if (i % 4 == 0) s"the quick brown fox $filler" else s"$filler jumps over it")
    }.toDF("doc_id", "src", "text")
    val got = HeavyHitters.ngramTopKByGroup(docs, n = 3, k = 4, m = 4096, groupCol = "src")
      .as[(String, String, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    val plain = {
      import org.apache.spark.sql.expressions.Window
      val t = graft.text.TextAnalysis.tokens(col("text"))
      val idx = when(size(t) >= 3, sequence(lit(0), size(t) - 3)).otherwise(array().cast("array<int>"))
      docs.select(col("src"), explode(transform(idx, i => concat_ws(" ", slice(t, i + 1, lit(3))))).as("gram"))
        .groupBy("src", "gram").agg(count(lit(1)).as("c"))
        .withColumn("rank", row_number().over(Window.partitionBy("src").orderBy(col("c").desc, col("gram"))))
        .filter(col("rank") <= 4)
        .as[(String, String, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    }
    assert(got === plain)
    // each group's ranks are 1..4
    got.groupBy(_._1).foreach { case (_, rows) => assert(rows.map(_._4) === (1 to 4)) }
  }

  test("WordNgrams kernel is byte-identical to the HOF gram formulation") {
    // adversarial shapes: leading/trailing tabs and newlines (SQL trim
    // strips U+0020 ONLY, and split(_, -1) keeps the trailing empty token),
    // multi-space runs, fewer tokens than n, empty and all-space strings,
    // uppercase + non-ASCII case folding, and plain corpus-like text
    val texts = Seq(
      "the quick brown fox jumps",
      "  leading and trailing  ",
      "\tTAB lead and trail\t",
      "one two",
      "", "   ", "\t", "a",
      "UPPER Case MiXeD words here",
      "café Über straße tür here",
      "multi   spacevt and\nnewline separated words",
      "ends with newline\n",
      "x y z w v u t s r q p"
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (n <- Seq(2, 3, 5)) {
      val hof = {
        val t = col("__t")
        val idx = when(size(t) >= n, sequence(lit(0), size(t) - n)).otherwise(array().cast("array<int>"))
        df.select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")).as("__t"))
          .select(col("doc_id"), posexplode(transform(idx, i => concat_ws(" ", slice(t, i + 1, lit(n))))))
          .select("doc_id", "pos", "col").as[(Long, Int, String)].collect().toSeq.sorted
      }
      val kernel = df.select(col("doc_id"), posexplode(graft.internal.SqlBridge.column(
          graft.functions.WordNgrams(graft.internal.SqlBridge.expression(col("text")), n))))
        .select("doc_id", "pos", "col").as[(Long, Int, String)].collect().toSeq.sorted
      assert(kernel === hof, s"n=$n")
    }
  }

  test("err > 0 recount path and err == 0 summary path agree with the exact count") {
    // The err == 0 shortcut (top-k straight from the exact summary, no
    // recount pass) and the err > 0 recount must both reproduce the plain
    // count. Group "ga" is the adversarial merge-truncation stream (two
    // partitions, 8 distinct grams each, merge truncates → err = 10 but the
    // heavies' counts of 100 keep k = 3 provable); group "gb" has 2 distinct
    // grams (err = 0, resolved driver-side). One grouped call exercises BOTH
    // paths at once; the global call pins the err > 0 recount alone.
    def doc(g: String) = s"$g $g $g" // one 3-gram per doc
    val gaP1 = Seq.fill(50)(doc("h1")) ++ Seq.fill(50)(doc("h2")) ++ Seq.fill(50)(doc("h3")) ++
      (1 to 5).flatMap(i => Seq.fill(10)(doc(s"a$i")))
    val gaP2 = Seq.fill(50)(doc("h1")) ++ Seq.fill(50)(doc("h2")) ++ Seq.fill(50)(doc("h3")) ++
      (1 to 5).flatMap(i => Seq.fill(10)(doc(s"b$i")))
    val gbAll = Seq.fill(7)(doc("q1")) ++ Seq.fill(3)(doc("q2"))
    val gaDocs = spark.sparkContext.parallelize(
      (gaP1 ++ gaP2).zipWithIndex.map { case (t, i) => (i.toLong, "ga", t) }, 2)
      .toDF("doc_id", "src", "text")
    val docs = gaDocs.unionByName(
      gbAll.zipWithIndex.map { case (t, i) => ((i + 5000).toLong, "gb", t) }
        .toDF("doc_id", "src", "text"))

    val plain = {
      import org.apache.spark.sql.expressions.Window
      val t = graft.text.TextAnalysis.tokens(col("text"))
      val idx = when(size(t) >= 3, sequence(lit(0), size(t) - 3)).otherwise(array().cast("array<int>"))
      docs.select(col("src"), explode(transform(idx, i => concat_ws(" ", slice(t, i + 1, lit(3))))).as("gram"))
        .groupBy("src", "gram").agg(count(lit(1)).as("c"))
        .withColumn("rank", row_number().over(Window.partitionBy("src").orderBy(col("c").desc, col("gram"))))
        .filter(col("rank") <= 3)
        .as[(String, String, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    }
    val got = HeavyHitters.ngramTopKByGroup(docs, n = 3, k = 3, m = 8, groupCol = "src")
      .as[(String, String, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    assert(got === plain)

    // the global form over just ga: err = 10 > 0, still provable at k = 3 —
    // the recount path, exact
    val globalGot = HeavyHitters.ngramTopK(gaDocs.select("doc_id", "text"), n = 3, k = 3, m = 8)
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    assert(globalGot.map(r => (r._1, r._2)) === Seq(("h1 h1 h1", 100L), ("h2 h2 h2", 100L), ("h3 h3 h3", 100L)))
  }

  test("ngramTopKByGroup proof failure names the offending group") {
    // src0: heavily skewed (provable); src1: near-uniform grams with tiny m
    val skew = (0 until 100).map(i => (i.toLong, "src0", "the quick brown fox"))
    val unif = (0 until 400).map(i => ((i + 1000).toLong, "src1", s"u$i v$i w$i z$i"))
    val docs = (skew ++ unif).toDF("doc_id", "src", "text")
    val e = intercept[Exception](
      HeavyHitters.ngramTopKByGroup(docs, n = 3, k = 3, m = 4, groupCol = "src").collect())
    assert(e.getMessage.contains("src1"), e.getMessage)
  }

  test("ngramTopKByGroup on an empty corpus is empty") {
    val docs = Seq.empty[(Long, String, String)].toDF("doc_id", "src", "text")
    assert(HeavyHitters.ngramTopKByGroup(docs, n = 3, k = 5, m = 64, groupCol = "src").count() === 0)
  }

  test("streaming sink converges to the batch answer; replays and restarts are safe") {
    import graft.streaming.StreamingOps
    val docs = (0 until 200).map { i =>
      val filler = (0 until 6).map(j => s"x${unit(i.toLong * 31 + j) * 50 % 50}".take(4)).mkString(" ")
      (i.toLong, if (i % 3 == 0) s"the quick brown fox $filler" else s"$filler jumps over it")
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("hh_sink").toString
    val sink = StreamingOps.heavyHittersSink(spark, dir, n = 3, m = 4096)
    // empty state reads as empty, not an error
    assert(StreamingOps.heavyHittersTopK(spark, dir, k = 5).count() === 0)
    sink(docs.filter(col("doc_id") % 3 === 0), 0L)
    sink(docs.filter(col("doc_id") % 3 === 1), 1L)
    sink(docs.filter(col("doc_id") % 3 === 2), 2L)
    def topNow(): Seq[(String, Long, Int)] =
      StreamingOps.heavyHittersTopK(spark, dir, k = 5)
        .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    val batch = HeavyHitters.ngramTopK(docs, n = 3, k = 5, m = 4096)
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    assert(topNow() === batch)
    // an at-least-once redelivery of a committed batch is a no-op
    sink(docs.filter(col("doc_id") % 3 === 1), 1L)
    assert(topNow() === batch)
    // a restart with different sketch parameters refuses loudly
    val e = intercept[Exception](StreamingOps.heavyHittersSink(spark, dir, n = 2, m = 4096))
    assert(e.getMessage.contains("incompatible"), e.getMessage)
  }

  test("sketch compaction preserves the answer and blocks folded-batch replays") {
    import graft.streaming.StreamingOps
    val docs = (0 until 200).map { i =>
      val filler = (0 until 6).map(j => s"x${unit(i.toLong * 31 + j) * 50 % 50}".take(4)).mkString(" ")
      (i.toLong, if (i % 3 == 0) s"the quick brown fox $filler" else s"$filler jumps over it")
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("hh_compact").toString
    val sink = StreamingOps.heavyHittersSink(spark, dir, n = 3, m = 4096)
    sink(docs.filter(col("doc_id") % 2 === 0), 0L)
    sink(docs.filter(col("doc_id") % 2 === 1), 1L)
    def topNow(): Seq[(String, Long, Int)] =
      StreamingOps.heavyHittersTopK(spark, dir, k = 5)
        .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    val before = topNow()
    StreamingOps.compactHeavyHitters(spark, dir)
    assert(topNow() === before, "compaction changed the answer")
    // a checkpoint-recovery replay of a FOLDED batch must not re-append
    sink(docs.filter(col("doc_id") % 2 === 1), 1L)
    assert(topNow() === before, "a folded-batch replay double-counted")
    // fresh post-compaction batches still absorb, and re-compaction folds them
    val extra = (1000 until 1100).map(i => (i.toLong, "the quick brown fox again")).toDF("doc_id", "text")
    sink(extra, 2L)
    val after = topNow()
    val batch = HeavyHitters.ngramTopK(
      docs.unionByName(extra), n = 3, k = 5, m = 4096)
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    assert(after === batch)
    StreamingOps.compactHeavyHitters(spark, dir)
    assert(topNow() === after)
  }

  test("grouped streaming sink converges to the per-group batch answer; compaction + misread guards") {
    import graft.streaming.StreamingOps
    val docs = (0 until 300).map { i =>
      val grp = s"src${i % 3}"
      val filler = (0 until 5).map(j => s"x${unit(i.toLong * 17 + j) * 40 % 40}".take(4)).mkString(" ")
      (i.toLong, grp, if (i % 4 == 0) s"the quick brown fox $filler" else s"$filler jumps over it")
    }.toDF("doc_id", "src", "text")
    val dir = java.nio.file.Files.createTempDirectory("hh_grp_sink").toString
    val sink = StreamingOps.heavyHittersSinkByGroup(spark, dir, n = 3, m = 4096, groupCol = "src")
    sink(docs.filter(col("doc_id") % 2 === 0), 0L)
    sink(docs.filter(col("doc_id") % 2 === 1), 1L)
    def topNow(): Seq[(String, String, Long, Int)] =
      StreamingOps.heavyHittersTopKByGroup(spark, dir, k = 4)
        .as[(String, String, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    val batch = HeavyHitters.ngramTopKByGroup(docs, n = 3, k = 4, m = 4096, groupCol = "src")
      .as[(String, String, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    assert(topNow() === batch)
    // compaction preserves; folded-batch replay is a no-op; fresh batches absorb
    StreamingOps.compactHeavyHitters(spark, dir)
    assert(topNow() === batch)
    sink(docs.filter(col("doc_id") % 2 === 1), 1L)
    assert(topNow() === batch)
    val extra = (1000 until 1080).map(i => (i.toLong, "src1", "the quick brown fox again"))
      .toDF("doc_id", "src", "text")
    sink(extra, 2L)
    val after = HeavyHitters.ngramTopKByGroup(docs.unionByName(extra),
        n = 3, k = 4, m = 4096, groupCol = "src")
      .as[(String, String, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    assert(topNow() === after)
    // a grouped dir refuses the global read, and vice versa
    val e1 = intercept[Exception](StreamingOps.heavyHittersTopK(spark, dir, k = 4))
    assert(e1.getMessage.contains("GROUPED"), e1.getMessage)
    val gdir = java.nio.file.Files.createTempDirectory("hh_glob_guard").toString
    StreamingOps.heavyHittersSink(spark, gdir, n = 3, m = 4096)
    val e2 = intercept[Exception](StreamingOps.heavyHittersTopKByGroup(spark, gdir, k = 4))
    assert(e2.getMessage.contains("GLOBAL"), e2.getMessage)
  }

  test("recount cache serves unchanged dirs and invalidates on any new batch") {
    import graft.streaming.StreamingOps
    val docs = (0 until 100).map(i =>
      (i.toLong, if (i % 2 == 0) "alpha beta gamma delta" else "alpha beta gamma other"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("hh_cache").toString
    val sink = StreamingOps.heavyHittersSink(spark, dir, n = 3, m = 1024)
    sink(docs, 0L)
    def topNow(k: Int): Seq[(String, Long, Int)] =
      StreamingOps.heavyHittersTopK(spark, dir, k)
        .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    val first = topNow(2)
    assert(first === HeavyHitters.ngramTopK(docs, n = 3, k = 2, m = 1024)
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3))
    // poison the cached rows while keeping the key: a second identical
    // read must serve them verbatim — PROOF the O(corpus) recount did not
    // re-run (no hidden re-read could reproduce a poisoned row)
    Seq(("POISON", 999L, 1)).toDF("gram", "n_count", "rank")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/cache/rows")
    assert(topNow(2) === Seq(("POISON", 999L, 1)))
    // a different k is a different key — fresh recount, no poison
    assert(!topNow(3).exists(_._1 == "POISON"))
    // a new committed batch changes the docs manifest — fresh recount
    Seq(("POISON", 999L, 1)).toDF("gram", "n_count", "rank")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/cache/rows")
    val extra = (1000 until 1050).map(i => (i.toLong, "alpha beta gamma fresh"))
      .toDF("doc_id", "text")
    sink(extra, 1L)
    val third = topNow(2)
    assert(!third.exists(_._1 == "POISON"))
    assert(third === HeavyHitters.ngramTopK(docs.unionByName(extra), n = 3, k = 2, m = 1024)
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3))
  }

  test("compactHeavyHittersIfNeeded fires only past the manifest batch threshold") {
    import graft.streaming.StreamingOps
    val dir = java.nio.file.Files.createTempDirectory("hh_gate").toString
    val sink = StreamingOps.heavyHittersSink(spark, dir, n = 2, m = 1024)
    (0 until 5).foreach { b =>
      sink((0 until 30).map(i => ((b * 100 + i).toLong, s"common pair plus t$b")).toDF("doc_id", "text"), b.toLong)
    }
    assert(StreamingOps.heavyHittersSketchBatches(spark, dir) === 5)
    def topNow(): Seq[(String, Long, Int)] =
      StreamingOps.heavyHittersTopK(spark, dir, k = 3)
        .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    val before = topNow()
    // under threshold: measured but not fired (no data scan either way)
    val (n1, fired1) = StreamingOps.compactHeavyHittersIfNeeded(spark, dir, maxBatches = 8)
    assert(n1 === 5 && !fired1)
    assert(StreamingOps.heavyHittersSketchBatches(spark, dir) === 5)
    // over threshold: fires, folds to one summary, answers unchanged
    val (n2, fired2) = StreamingOps.compactHeavyHittersIfNeeded(spark, dir, maxBatches = 4)
    assert(n2 === 5 && fired2)
    assert(StreamingOps.heavyHittersSketchBatches(spark, dir) === 1)
    assert(topNow() === before, "gated compaction changed the answer")
    // folded-batch replays are still blocked after the gated fold
    sink((0 until 30).map(i => (i.toLong, "common pair plus t0")).toDF("doc_id", "text"), 0L)
    assert(topNow() === before, "a folded-batch replay double-counted")
  }

  test("a half-committed batch (docs on disk, sketch missing) is invisible to the read") {
    import graft.streaming.StreamingOps
    val docs = (0 until 80).map(i => (i.toLong, "red green blue cyan")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("hh_torn").toString
    val sink = StreamingOps.heavyHittersSink(spark, dir, n = 3, m = 1024)
    sink(docs, 0L)
    def topNow(): Seq[(String, Long, Int)] =
      StreamingOps.heavyHittersTopK(spark, dir, k = 2)
        .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    val before = topNow()
    // simulate a crash between the docs append and the sketch write: the
    // batch's doc files exist but neither manifest lists them — the
    // manifest-restricted read must not count them (counting docs whose
    // sketch never landed would silently break the exactness proof)
    val stray = (1000 until 1040).map(i => (i.toLong, "red green blue stray"))
      .toDF("doc_id", "text")
    stray.write.parquet(s"$dir/docs/batch=7")
    assert(topNow() === before, "uncommitted stray docs leaked into the exact recount")
    // the stream's redelivery of that batch then commits it properly
    // (the sink wipes the partial dir and rewrites both halves)
    sink(stray, 7L)
    assert(topNow() === HeavyHitters.ngramTopK(docs.unionByName(stray), n = 3, k = 2, m = 1024)
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3))
  }

  test("a torn folded-sidecar swap never loses the replay guard") {
    import graft.streaming.StreamingOps
    val docs = (0 until 60).map(i => (i.toLong, "one two three four")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("hh_folded_torn").toString
    val sink = StreamingOps.heavyHittersSink(spark, dir, n = 3, m = 1024)
    sink(docs, 0L)
    StreamingOps.compactHeavyHitters(spark, dir)
    def topNow(): Seq[(String, Long, Int)] =
      StreamingOps.heavyHittersTopK(spark, dir, k = 2)
        .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    val before = topNow()
    // simulate a crash between the sidecar delete and rename of a LATER
    // compaction: the live sidecar is gone, the complete tmp survives
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/folded"),
      java.nio.file.Paths.get(s"$dir/folded.tmp"))
    // the guard must still block a replay of the folded batch 0
    sink(docs, 0L)
    assert(topNow() === before, "torn sidecar swap lost the folded-batch replay guard")
    // and the next compaction resumes the swap back to a live sidecar
    StreamingOps.compactHeavyHitters(spark, dir)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/folded")))
    sink(docs, 0L)
    assert(topNow() === before)
  }

  test("streaming read keeps the exact-or-throw contract (tiny m, near-uniform)") {
    import graft.streaming.StreamingOps
    val docs = (0 until 400).map(i => (i.toLong, s"u$i v$i w$i z$i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("hh_sink_throw").toString
    val sink = StreamingOps.heavyHittersSink(spark, dir, n = 3, m = 4)
    sink(docs, 0L)
    val e = intercept[Exception](StreamingOps.heavyHittersTopK(spark, dir, k = 3).collect())
    assert(e.getMessage.contains("not provable"), e.getMessage)
  }

  test("mutable MgAcc tree fold equals the immutable merge fold (incl. truncation rounds)") {
    import graft.text.HeavyHitters._
    // adversarial: skewed head + long uniform tail, tiny m so every merge
    // truncates; several partitionings so the tree shape varies
    val rnd = new scala.util.Random(7)
    val stream = (0 until 3000).map { i =>
      if (rnd.nextInt(10) < 4) s"hot${rnd.nextInt(3)}" else s"cold${rnd.nextInt(800)}"
    }
    for (parts <- Seq(1, 3, 8); m <- Seq(4, 16, 64)) {
      val chunks = stream.grouped(math.max(1, stream.size / parts)).toSeq
      val viaSummary = chunks.map(c => sketchPartition(c.iterator, m))
        .foldLeft(MgSummary(Map.empty, 0L, 0L))((a, b) => merge(a, b, m))
      val viaAcc = chunks.map(c => sketchPartitionAcc(c.iterator, m))
        .foldLeft(MgAcc.empty)((a, b) => a.mergeIn(b, m)).toSummary
      assert(viaAcc === viaSummary, s"parts=$parts m=$m")
    }
    // grouped form: same stream split across 3 groups
    val keyed = stream.zipWithIndex.map { case (g, i) => (s"g${i % 3}", g) }
    for (parts <- Seq(1, 4); m <- Seq(8, 32)) {
      val chunks = keyed.grouped(math.max(1, keyed.size / parts)).toSeq
      val viaSummary = chunks.map(c => sketchPartitionByGroup(c.iterator, m))
        .foldLeft(Map.empty[String, MgSummary])((a, b) => mergeByGroup(a, b, m))
      val viaAcc = chunks.map(c => sketchPartitionByGroupAcc(c.iterator, m))
        .foldLeft(MgGroupAcc.empty)((a, b) => a.mergeIn(b, m)).toSummaries
      assert(viaAcc === viaSummary, s"grouped parts=$parts m=$m")
    }
  }
}
