package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PROVABLY-EXACT top-k heavy hitters over a key space too large to
  * shuffle: a Misra–Gries candidate pass with mergeable summaries
  * (Agarwal et al. 2013, "Mergeable Summaries"), then an exact recount of
  * the ≤ m candidates, then a runtime proof check.
  *
  * Why not `groupBy(key).count.orderBy.limit(k)`: for TOKENS the distinct
  * key space is vocab-sized (Heaps' law) and that plan is fine — but for
  * n-GRAMS the distinct space grows toward corpus-sized (trillions of
  * distinct 5-grams at 100 TB), and the full-count shuffle moves nearly
  * one row per corpus position. Misra–Gries bounds executor memory at m
  * counters, the tree-reduced merge returns ONE m-entry summary to the
  * driver (O(m), never O(distinct)), and the recount shuffle carries only
  * rows matching the ≤ m broadcast candidates.
  *
  * Exactness, not estimation: the merged sketch guarantees
  * true(g) ∈ [cnt(g), cnt(g) + err] for tracked g and true(g) ≤ err for
  * absent g, with `err` ACCOUNTED AT RUNTIME (sum of decrement rounds +
  * per-merge truncation offsets) rather than assumed from N/(m+1). After
  * the exact recount, `kth > err` proves no absent key can displace the
  * top-k — and the operator THROWS when the proof fails (raise m), never
  * returns a silently-approximate ranking.
  */
object HeavyHitters {

  /** Mergeable Misra–Gries summary: counts are lower bounds, any true
    * count exceeds its entry by at most `err`; keys not present have true
    * count ≤ `err`. `total` = stream length consumed.
    */
  final case class MgSummary(counts: Map[String, Long], err: Long, total: Long)
      extends Serializable

  /** Mutable Misra–Gries accumulator: m counters, O(1) amortized per item
    * (each decrement round is O(m) but consumes ≥ m stream positions).
    */
  final class MgState(m: Int) {
    private val c = new java.util.HashMap[String, Long](m * 2)
    private var err = 0L
    private var total = 0L
    def add(g: String): Unit = {
      total += 1
      val cur = c.get(g)
      if (cur != 0L || c.containsKey(g)) c.put(g, cur + 1)
      else if (c.size < m) c.put(g, 1L)
      else {
        err += 1
        val itr = c.entrySet().iterator()
        while (itr.hasNext) {
          val e = itr.next()
          if (e.getValue == 1L) itr.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    def summary: MgSummary = {
      import scala.jdk.CollectionConverters._
      MgSummary(c.asScala.toMap, err, total)
    }
    /** Hand the internal map to a merge accumulator (the state is
      * discarded after — no copy). */
    def acc: MgAcc = new MgAcc(c, err, total)
  }

  /** One-pass MG over a partition. */
  def sketchPartition(it: Iterator[String], m: Int): MgSummary = {
    val s = new MgState(m)
    while (it.hasNext) s.add(it.next())
    s.summary
  }

  /** [[sketchPartition]] returning the mutable accumulator — the
    * tree-aggregate input (skips the per-partition immutable-map copy). */
  def sketchPartitionAcc(it: Iterator[String], m: Int): MgAcc = {
    val s = new MgState(m)
    while (it.hasNext) s.add(it.next())
    s.acc
  }

  /** The mergeable-summaries truncation: if over m keys, subtract the
    * (m+1)-th largest value from every counter and drop the non-positive
    * ones; returns the subtracted offset (it adds to the error bound
    * exactly like a decrement round). No-op (returns 0) at ≤ m keys.
    */
  private def truncate(c: java.util.HashMap[String, Long], m: Int): Long =
    if (c.size <= m) 0L
    else {
      val vals = new Array[Long](c.size)
      var i = 0
      val it0 = c.values().iterator()
      while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val s = vals(c.size - m - 1) // (m+1)-th largest
      val itr = c.entrySet().iterator()
      while (itr.hasNext) {
        val e = itr.next()
        if (e.getValue <= s) itr.remove() else e.setValue(e.getValue - s)
      }
      s
    }

  /** Mutable merge accumulator for the tree-aggregate hot path: the same
    * (counts, err, total) as [[MgSummary]] held in a mutable java map, so
    * a tree of merges adds the SMALLER side into the larger in place
    * instead of building a fresh immutable map per merge — the per-merge
    * copy dominated the fold at groups × m entries (the grouped corpus
    * report holds up to groups × 16k counters per partition summary).
    * Merge math is [[truncate]]'s rule value-for-value, so the final
    * [[toSummary]] is identical to a [[merge]] fold; HeavyHittersSpec
    * asserts the equivalence on adversarial streams.
    */
  final class MgAcc(var counts: java.util.HashMap[String, Long],
      var err: Long, var total: Long) extends Serializable {
    /** Merge `b` into this accumulator and return THIS (the Spark
      * aggregate contract: the first argument may be mutated and
      * returned; `b` is consumed — its map may be stolen or drained). */
    def mergeIn(b: MgAcc, m: Int): MgAcc = {
      if (b.counts.size > counts.size) { val t = counts; counts = b.counts; b.counts = t }
      val itr = b.counts.entrySet().iterator()
      while (itr.hasNext) {
        val e = itr.next()
        counts.put(e.getKey, counts.getOrDefault(e.getKey, 0L) + e.getValue)
      }
      err += b.err
      total += b.total
      err += truncate(counts, m)
      this
    }
    def toSummary: MgSummary = {
      import scala.jdk.CollectionConverters._
      MgSummary(counts.asScala.toMap, err, total)
    }
  }
  object MgAcc {
    def empty: MgAcc = new MgAcc(new java.util.HashMap[String, Long](), 0L, 0L)
  }

  /** Keyed [[MgAcc]]s — the grouped tree-aggregate accumulator. */
  final class MgGroupAcc(var groups: java.util.HashMap[String, MgAcc])
      extends Serializable {
    def mergeIn(b: MgGroupAcc, m: Int): MgGroupAcc = {
      if (b.groups.size > groups.size) { val t = groups; groups = b.groups; b.groups = t }
      val itr = b.groups.entrySet().iterator()
      while (itr.hasNext) {
        val e = itr.next()
        val mine = groups.get(e.getKey)
        if (mine == null) groups.put(e.getKey, e.getValue)
        else groups.put(e.getKey, mine.mergeIn(e.getValue, m))
      }
      this
    }
    def toSummaries: Map[String, MgSummary] = {
      import scala.jdk.CollectionConverters._
      groups.asScala.iterator.map { case (g, a) => (g, a.toSummary) }.toMap
    }
  }
  object MgGroupAcc {
    def empty: MgGroupAcc = new MgGroupAcc(new java.util.HashMap[String, MgAcc]())
  }

  /** Merge two summaries: sum counts, then — if over m keys — subtract the
    * (m+1)-th largest value from every counter and drop the non-positive
    * ones (the mergeable-summaries truncation; the subtracted offset adds
    * to the error bound exactly like a decrement round).
    */
  def merge(a: MgSummary, b: MgSummary, m: Int): MgSummary = {
    val c = new java.util.HashMap[String, Long](a.counts.size + b.counts.size)
    a.counts.foreach { case (g, v) => c.put(g, v) }
    b.counts.foreach { case (g, v) => c.put(g, c.getOrDefault(g, 0L) + v) }
    val err = a.err + b.err + truncate(c, m)
    import scala.jdk.CollectionConverters._
    MgSummary(c.asScala.toMap, err, a.total + b.total)
  }

  /** The contiguous word n-grams of `textCol` as one exploded column
    * (`gram`, space-joined) — a narrow codegen projection, no shuffle.
    * The gram assembly is the fused [[graft.functions.WordNgrams]] kernel
    * (one tokenize + one join loop per document); the previous
    * tokens-materialized HOF chain (`sequence` → `transform` →
    * `concat_ws(slice)`) produced byte-identical grams but re-walked a
    * five-expression tree per gram index — the kernel halves the gram
    * stream's scan cost, which every sketch/recount pass here pays.
    */
  def ngrams(docs: DataFrame, n: Int, textCol: String = "text"): DataFrame = {
    val grams = graft.internal.SqlBridge.column(
      graft.functions.WordNgrams(graft.internal.SqlBridge.expression(col(textCol)), n))
    docs.select(explode(grams).as("gram"))
  }

  /** Exact top-k most frequent n-grams, (gram, n_count, rank) ranked by
    * (count DESC, gram). Two passes over the gram stream: MG candidates
    * (tree-reduced, driver sees one m-entry summary), then an exact
    * recount of grams matching the broadcast candidate set. Throws if the
    * k-th exact count does not exceed the accounted error bound — the
    * result is exact or it is an error, never silently approximate.
    */
  def ngramTopK(docs: DataFrame, n: Int, k: Int, m: Int,
      textCol: String = "text"): DataFrame = {
    require(m > k, s"sketch size m ($m) must exceed k ($k)")
    val grams: Dataset[String] = {
      val spark = docs.sparkSession
      import spark.implicits._
      ngrams(docs, n, textCol).as[String]
    }
    // treeAggregate, not treeReduce: the accumulator has an identity
    // element by construction, and treeReduce throws on a zero-partition
    // RDD (the empty-DataFrame shape). Mutable MgAcc path: each merge
    // folds the smaller side into the larger in place (proven equal to
    // the immutable [[merge]] fold in HeavyHittersSpec).
    val mg = grams.rdd
      .mapPartitions(it => Iterator(sketchPartitionAcc(it, m)))
      .treeAggregate(MgAcc.empty)(
        (a, b) => a.mergeIn(b, m), (a, b) => a.mergeIn(b, m), depth = 2)
      .toSummary
    recountAndProve(docs, n, k, m, mg, textCol)
  }

  /** Spark orders StringType by UTF-8 binary comparison (UTF8String), not
    * by Java's UTF-16 `String` order — the two disagree on ties involving
    * supplementary-plane vs U+E000..U+FFFF text. Driver-side rankings that
    * must reproduce a `Window.orderBy(col)` tie-break use THIS comparator.
    */
  private def utf8Less(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0

  /** Top-k of an err == 0 summary, ranked by (count DESC, gram ASC) — the
    * identical ranking the recount's `row_number` window produces. With a
    * zero error bound the sketch never decremented and no merge truncated,
    * so its counts are EXACT for tracked grams and every untracked gram has
    * true count ≤ err = 0 (i.e. none exist): the top-k is provable from the
    * m-bounded summary alone, and the whole recount pass over the corpus —
    * candidate broadcast, second gram scan, count shuffle — is redundant
    * work (guide §1.2: don't compute what is already proven). The recount
    * path below stays the contract whenever err > 0.
    */
  private def exactFromSummary(s: MgSummary, k: Int): Seq[(String, Long, Int)] =
    s.counts.toSeq
      .sortWith((x, y) => x._2 > y._2 || (x._2 == y._2 && utf8Less(x._1, y._1)))
      .take(k)
      .zipWithIndex.map { case ((g, c), i) => (g, c, i + 1) }

  /** Exact recount of `mg`'s candidates over `docs` + the runtime proof —
    * the shared back half of [[ngramTopK]] and the streaming-maintained
    * form ([[graft.streaming.StreamingOps.heavyHittersTopK]], where the
    * sketch was accumulated across micro-batches; mergeability makes the
    * combined summary carry the identical guarantee). When the summary's
    * error bound is 0 the sketch itself is exact and the recount pass is
    * skipped outright ([[exactFromSummary]]) — `docs` is then not scanned
    * at all, so `mg` MUST be a summary of exactly the gram stream `docs`
    * yields (which is every in-contract use: the exactness guarantee is
    * only meaningful for the corpus the sketch consumed).
    */
  def recountAndProve(docs: DataFrame, n: Int, k: Int, m: Int, mg: MgSummary,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    if (mg.err == 0L) return exactFromSummary(mg, k).toDF("gram", "n_count", "rank")
    val cands = mg.counts.keys.toSeq.toDF("gram")
    // ≤ m rows survive the broadcast-candidate filter; the collect below is
    // ≤ k rows — bounded at any corpus size, and it releases the plan
    // instead of leaking a cached DataFrame into the session.
    val top = ngrams(docs, n, textCol)
      .join(broadcast(cands), Seq("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_count"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_count").desc, col("gram"))))
      .filter(col("rank") <= k)
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    // Proof: with k ranks filled, kth > err means no untracked gram (true
    // count ≤ err) can displace any of them. With FEWER than k ranks the
    // kth test is vacuous — untracked grams with true counts in [1, err]
    // could fill the missing ranks — so a short result is exact only when
    // nothing was ever decremented or truncated (err == 0).
    if (top.size < k) {
      require(mg.err == 0L,
        s"top-$k not provable: only ${top.size} candidates survive and the error " +
          s"bound ${mg.err} > 0 — untracked grams could fill the missing ranks; raise m")
    } else require(top.last._2 > mg.err,
      s"top-$k not provable: k-th exact count ${top.last._2} <= error bound ${mg.err} " +
        s"(stream length ${mg.total}, m=$m) — raise the sketch size m")
    top.toDF("gram", "n_count", "rank")
  }

  /** One-pass MG per GROUP over a partition: one m-counter state per group
    * key seen, so partition memory is (local groups) × m.
    */
  def sketchPartitionByGroup(it: Iterator[(String, String)], m: Int): Map[String, MgSummary] = {
    val states = new java.util.HashMap[String, MgState]()
    while (it.hasNext) {
      val (grp, g) = it.next()
      var s = states.get(grp)
      if (s == null) { s = new MgState(m); states.put(grp, s) }
      s.add(g)
    }
    import scala.jdk.CollectionConverters._
    states.asScala.iterator.map { case (grp, s) => (grp, s.summary) }.toMap
  }

  /** [[sketchPartitionByGroup]] returning the mutable grouped accumulator
    * — the tree-aggregate input (skips groups × m immutable-map copies
    * per partition). */
  def sketchPartitionByGroupAcc(it: Iterator[(String, String)], m: Int): MgGroupAcc = {
    val states = new java.util.HashMap[String, MgState]()
    while (it.hasNext) {
      val (grp, g) = it.next()
      var s = states.get(grp)
      if (s == null) { s = new MgState(m); states.put(grp, s) }
      s.add(g)
    }
    val out = new java.util.HashMap[String, MgAcc](states.size * 2)
    val itr = states.entrySet().iterator()
    while (itr.hasNext) { val e = itr.next(); out.put(e.getKey, e.getValue.acc) }
    new MgGroupAcc(out)
  }

  /** Keyed merge of per-group summaries — each group's sketch merges with
    * [[merge]]'s truncation-and-account rule independently.
    */
  def mergeByGroup(a: Map[String, MgSummary], b: Map[String, MgSummary],
      m: Int): Map[String, MgSummary] =
    (a.keySet ++ b.keySet).iterator.map { grp =>
      grp -> ((a.get(grp), b.get(grp)) match {
        case (Some(x), Some(y)) => merge(x, y, m)
        case (Some(x), None)    => x
        case (None, Some(y))    => y
        case (None, None)       => MgSummary(Map.empty, 0L, 0L) // unreachable
      })
    }.toMap

  /** Exact top-k most frequent n-grams PER GROUP — the corpus-report shape
    * (top n-grams per source, top domains per language; C4/Gopher-style
    * audits). Same two-pass scheme as [[ngramTopK]] with everything keyed:
    * per-(partition, group) MG sketches tree-merged to one (groups × m)-
    * bounded table on the driver, an exact recount filtered by the
    * broadcast (group, gram) candidate pairs, and the exact-or-throw proof
    * applied PER GROUP — with k ranks filled the group's k-th count must
    * exceed its accounted error bound; with fewer, the group's bound must
    * be zero (a short list is exact only when nothing was decremented or
    * truncated in that group's sketch).
    *
    * Memory: driver and each executor hold groups × m counters — the
    * reporting use case (languages, sources, domains-per-language) has
    * bounded group cardinality; the GRAM space, which is what grows toward
    * corpus size at 100 TB, never shuffles unfiltered.
    *
    * Returns (groupCol, gram, n_count, rank), rank dense per group by
    * (count DESC, gram).
    */
  /** The (group, gram) stream of `docs` — [[ngrams]] keyed by the
    * string-cast group column. Rows with a NULL group are dropped (a
    * null key is not a reportable group).
    */
  def ngramsByGroup(docs: DataFrame, n: Int, groupCol: String,
      textCol: String = "text"): DataFrame = {
    val grams = graft.internal.SqlBridge.column(
      graft.functions.WordNgrams(graft.internal.SqlBridge.expression(col(textCol)), n))
    docs
      .select(col(groupCol).cast("string").as("grp"), grams.as("__hh_grams"))
      .filter(col("grp").isNotNull)
      .select(col("grp"), explode(col("__hh_grams")).as("gram"))
  }

  def ngramTopKByGroup(docs: DataFrame, n: Int, k: Int, m: Int,
      groupCol: String, textCol: String = "text"): DataFrame = {
    require(m > k, s"sketch size m ($m) must exceed k ($k)")
    val spark = docs.sparkSession
    import spark.implicits._
    val mg = ngramsByGroup(docs, n, groupCol, textCol).as[(String, String)].rdd
      .mapPartitions(it => Iterator(sketchPartitionByGroupAcc(it, m)))
      .treeAggregate(MgGroupAcc.empty)(
        (a, b) => a.mergeIn(b, m), (a, b) => a.mergeIn(b, m), depth = 2)
      .toSummaries
    recountAndProveByGroup(docs, n, k, m, mg, groupCol, textCol)
  }

  /** Per-group exact recount + proof — the shared back half of
    * [[ngramTopKByGroup]] and the streaming-maintained grouped form.
    */
  def recountAndProveByGroup(docs: DataFrame, n: Int, k: Int, m: Int,
      mg: Map[String, MgSummary], groupCol: String,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // per-group split: an err == 0 group's sketch is already exact — its
    // top-k resolves from the m-bounded summary with no corpus work
    // ([[exactFromSummary]]); only err > 0 groups pay the recount, and the
    // candidate broadcast shrinks to just their tracked grams. In the
    // common bounded-key-space regime (per-group distinct grams ≤ m) the
    // whole second pass disappears.
    val (exactG, recountG) = mg.partition(_._2.err == 0L)
    val exactRows = exactG.toSeq.flatMap { case (grp, s) =>
      exactFromSummary(s, k).map { case (g, c, r) => (grp, g, c, r) }
    }
    val recountRows: Seq[(String, String, Long, Int)] = if (recountG.isEmpty) Seq.empty else {
      val cands = recountG.toSeq
        .flatMap { case (grp, s) => s.counts.keysIterator.map(g => (grp, g)) }
        .toDF("grp", "gram")
      val top = ngramsByGroup(docs, n, groupCol, textCol)
        .join(broadcast(cands), Seq("grp", "gram"))
        .groupBy("grp", "gram").agg(count(lit(1)).as("n_count"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("grp").orderBy(col("n_count").desc, col("gram"))))
        .filter(col("rank") <= k)
        .as[(String, String, Long, Int)].collect().toSeq
      val byGrp = top.groupBy(_._1)
      recountG.foreach { case (grp, s) =>
        val rows = byGrp.getOrElse(grp, Seq.empty)
        if (rows.size < k) {
          require(s.err == 0L,
            s"top-$k not provable for group '$grp': only ${rows.size} candidates survive " +
              s"and the error bound ${s.err} > 0 — raise m")
        } else require(rows.map(_._3).min > s.err,
          s"top-$k not provable for group '$grp': k-th exact count ${rows.map(_._3).min} " +
            s"<= error bound ${s.err} (stream length ${s.total}, m=$m) — raise m")
      }
      top
    }
    (exactRows ++ recountRows)
      .sortBy(r => (r._1, r._4)).toDF(groupCol, "gram", "n_count", "rank")
  }
}
