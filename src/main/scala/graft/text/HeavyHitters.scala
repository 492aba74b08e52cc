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

  /** One-pass MG over a partition: m counters, O(1) amortized per item
    * (each decrement round is O(m) but consumes ≥ m stream positions).
    */
  def sketchPartition(it: Iterator[String], m: Int): MgSummary = {
    val c = new java.util.HashMap[String, Long](m * 2)
    var err = 0L
    var total = 0L
    while (it.hasNext) {
      val g = it.next()
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
    import scala.jdk.CollectionConverters._
    MgSummary(c.asScala.toMap, err, total)
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
    var err = a.err + b.err
    if (c.size > m) {
      val vals = new Array[Long](c.size)
      var i = 0
      val it0 = c.values().iterator()
      while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val s = vals(c.size - m - 1) // (m+1)-th largest
      err += s
      val itr = c.entrySet().iterator()
      while (itr.hasNext) {
        val e = itr.next()
        if (e.getValue <= s) itr.remove() else e.setValue(e.getValue - s)
      }
    }
    import scala.jdk.CollectionConverters._
    MgSummary(c.asScala.toMap, err, a.total + b.total)
  }

  /** The contiguous word n-grams of `textCol` as one exploded column
    * (`gram`, space-joined) — a narrow codegen projection, no shuffle.
    */
  def ngrams(docs: DataFrame, n: Int, textCol: String = "text"): DataFrame = {
    val t = TextAnalysis.tokens(col(textCol))
    val idx = when(size(t) >= n, sequence(lit(0), size(t) - n))
      .otherwise(array().cast("array<int>"))
    docs.select(explode(transform(idx, i => concat_ws(" ", slice(t, i + 1, lit(n))))).as("gram"))
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
    val spark = docs.sparkSession
    import spark.implicits._
    val grams: Dataset[String] = ngrams(docs, n, textCol).as[String]
    val mg = grams.rdd
      .mapPartitions(it => Iterator(sketchPartition(it, m)))
      .treeReduce((a, b) => merge(a, b, m), depth = 2)
    val cands = mg.counts.keys.toSeq.toDF("gram")
    val ranked = grams.toDF("gram")
      .join(broadcast(cands), Seq("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_count"))
      // ≤ m rows from here on: the single-partition window is bounded
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_count").desc, col("gram"))))
      .filter(col("rank") <= k)
      .cache()
    val kthRow = ranked.agg(min("n_count")).head()
    if (kthRow.isNullAt(0)) {
      // no candidates at all: exact (vacuously) only if nothing was dropped
      require(mg.err == 0L,
        s"top-$k not provable on an all-dropped stream (error bound ${mg.err}) — raise m")
    } else require(kthRow.getLong(0) > mg.err,
      s"top-$k not provable: k-th exact count ${kthRow.getLong(0)} <= error bound ${mg.err} " +
        s"(stream length ${mg.total}, m=$m) — raise the sketch size m")
    ranked
  }
}
