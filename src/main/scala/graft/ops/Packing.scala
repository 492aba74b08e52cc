package graft.ops

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing — the concat-and-chunk step that turns a curated corpus
  * into fixed-length training blocks (the GPT-style pretraining layout:
  * documents concatenated in a deterministic order with an EOS separator,
  * the token stream sliced into `blockLen`-token blocks, each document
  * mapped to the block(s) its tokens land in).
  *
  * The packing stream is keyed by (source, shard): documents are ordered by
  * `doc_id` within their stream and shard = doc_id mod `nShards`. A single
  * corpus-wide ordered stream would funnel the prefix sum through one
  * partition — the (source, shard) key keeps every window group bounded by
  * construction at any corpus size (size `nShards` to the data; any
  * deterministic shard key works, e.g. a hash for skewed id spaces).
  * Training-data layouts shard the packing stream anyway: block identity
  * only has to be deterministic, not global.
  *
  * One window shuffle (the per-stream prefix sum) + a narrow explode of each
  * document onto the blocks it overlaps — rows out ≈ rows in + one extra row
  * per block boundary a document straddles. No driver state, no global sort.
  *
  * Token counts are whitespace tokens ([[TextAnalysis.tokens]]) + 1 EOS per
  * document, so offsets are reproducible by any engine with the same
  * tokenizer (the catalog oracle replays the identical arithmetic in DuckDB).
  */
object Packing {

  /** Above this many documents in one (source, shard) group, [[packBestFit]]
    * logs a mis-sized-nShards warning: the group is buffered whole in one
    * task, so a group this large is an OOM in waiting at corpus scale.
    */
  private[graft] val GroupSizeWarnThreshold: Int = 1 << 20

  /** Map every document onto its training blocks.
    *
    * Output: (source, shard, block, doc_id, n_tokens, tok_start, tok_end,
    * n_in_block) — offsets within the (source, shard) token stream,
    * `[tok_start, tok_end)` spanning the document's tokens + EOS, and
    * `n_in_block` the portion landing in `block`. Summing `n_in_block` over
    * a document's rows gives back `n_tokens`; summing over a block gives
    * `blockLen` except for each stream's tail block.
    */
  def packBlocks(docs: DataFrame, blockLen: Int, nShards: Int): DataFrame = {
    require(blockLen > 0, s"blockLen must be positive, got $blockLen")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val l = lit(blockLen.toLong)
    val w = Window.partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("source"), pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        col("doc_id"),
        (size(TextAnalysis.tokens(col("text"))).cast(LongType) + lit(1L)).as("n_tokens"))
      .withColumn("tok_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("tok_end", col("tok_start") + col("n_tokens"))
      .withColumn("block",
        explode(sequence(floor(col("tok_start") / l).cast(LongType),
          floor((col("tok_end") - lit(1L)) / l).cast(LongType))))
      .withColumn("n_in_block",
        least(col("tok_end"), (col("block") + lit(1L)) * l)
          - greatest(col("tok_start"), col("block") * l))
      .select("source", "shard", "block", "doc_id", "n_tokens",
        "tok_start", "tok_end", "n_in_block")
  }

  /** Per-block fill summary over [[packBlocks]] output: how many documents
    * touch each block and how full it is — the packing-efficiency view
    * (tail blocks under-fill; everything else must be exactly `blockLen`).
    */
  def packSummary(packed: DataFrame, blockLen: Int): DataFrame =
    packed.groupBy("source", "shard", "block")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_in_block").as("n_tokens"),
        (sum("n_in_block") / lit(blockLen.toDouble)).as("fill_ratio"))

  /** NON-SPLITTING best-fit sequence packing (first-fit-decreasing — the
    * Krell et al. 2021 "Efficient Sequence Packing" family): each document
    * is assigned to exactly ONE `blockLen`-token bin, so no training
    * sequence carries a document split across block boundaries (the
    * cross-document-attention contamination [[packBlocks]]'s GPT-style
    * concat-and-chunk accepts). The price is padding: bins fill to ≤
    * `blockLen` and the tail capacity is wasted — FFD keeps that waste
    * near the bin-packing optimum (≤ 11/9·OPT + 6/9 bins, Dósa 2007).
    *
    * Deterministic and engine-replayable: within each (source, shard)
    * group documents are ordered by (n_tokens DESC, doc_id ASC) and
    * placed first-fit into the lowest-indexed bin with enough remaining
    * capacity, opening bin `len(bins)` when none fits — a pure function
    * of the group's rows, so a SQL engine replays it with a recursive
    * CTE over the same ordering (the catalog oracle does exactly that).
    *
    * A document LONGER than `blockLen` (with its EOS) fits no bin and
    * opens its own: its bin's remaining capacity goes negative, which no
    * later (smaller) document can satisfy, so oversized documents end up
    * alone in overfull bins — visible as fill_ratio > 1 in
    * [[packSummary]], for downstream truncation policy to handle rather
    * than this operator silently splitting or dropping them.
    *
    * Scale shape: one shuffle on (source, shard); each group is buffered
    * and sorted in one task, with bin state O(group tokens / blockLen) —
    * `nShards` is the bound on group size exactly as in [[packBlocks]]
    * (size it to the data; the assignment is shard-local by design, so
    * more shards = smaller groups = more parallelism, at zero cost to
    * packing quality beyond the shard boundary — pick nShards so groups
    * land near a Spark-partition's worth of documents, since each group
    * is buffered whole in one task for the sort). The first-fit lookup
    * runs through [[FirstFitTree]] — a max segment tree over bin
    * remaining capacities, O(log bins) per document instead of the
    * textbook linear scan's O(bins), with IDENTICAL bin choices
    * (PackingSpec pins the equivalence against the linear scan).
    *
    * Output: (source, shard, bin, doc_id, n_tokens) — one row per
    * document. Token counts are whitespace tokens + 1 EOS, the same
    * arithmetic as [[packBlocks]]. Feed to [[packBestFitSummary]] for
    * the fill-ratio report.
    */
  def packBestFit(docs: DataFrame, blockLen: Int, nShards: Int): DataFrame = {
    require(blockLen > 0, s"blockLen must be positive, got $blockLen")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source").cast("string"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        col("doc_id").cast(LongType),
        (size(TextAnalysis.tokens(col("text"))).cast(LongType) + lit(1L)).as("n_tokens"))
      .as[(String, Long, Long, Long)]
      .groupByKey { case (src, shard, _, _) => (src, shard) }
      .flatMapGroups { (key: (String, Long), it: Iterator[(String, Long, Long, Long)]) =>
        val (src, shard) = key
        val items = it.toArray.sortBy { case (_, _, id, n) => (-n, id) }
        // each group is buffered whole in this task — a group far past a
        // Spark-partition's worth of documents means nShards is mis-sized
        // for the corpus; warn BEFORE the task OOMs so the operator's
        // sizing contract (scaladoc above) is enforced at runtime, not
        // just documented
        if (items.length > GroupSizeWarnThreshold) {
          System.err.println(
            s"[graft.Packing] packBestFit group (source=$src, shard=$shard) holds " +
              s"${items.length} documents (> $GroupSizeWarnThreshold) — nShards is " +
              "likely too small for this corpus; raise it so groups fit one task's memory")
        }
        val bins = new FirstFitTree(items.length)
        items.iterator.map { case (_, _, id, n) =>
          val b = bins.findFirst(n) match {
            case -1 => val nb = bins.size; bins.set(nb, blockLen - n); nb
            case f => bins.set(f, bins.remaining(f) - n); f
          }
          (src, shard, b.toLong, id, n)
        }
      }
      .toDF("source", "shard", "bin", "doc_id", "n_tokens")
  }

  /** First-fit bin lookup in O(log bins): a max segment tree over bin
    * remaining capacities in bin-index order. Descending left-subtree-
    * first yields the LOWEST-indexed bin with capacity ≥ need — exactly
    * the linear scan's first-fit choice, without its O(bins)
    * per-document term (the quadratic half of first-fit-decreasing's
    * textbook cost). Capacity is `maxBins` leaves, pre-sized to the
    * group's document count (bins ≤ docs always); unopened bins hold
    * Long.MinValue so they never satisfy a fit probe.
    */
  private[graft] final class FirstFitTree(maxBins: Int) {
    private val cap: Int = {
      var c = 1
      while (c < math.max(1, maxBins)) c *= 2
      c
    }
    private val tree = Array.fill(2 * cap)(Long.MinValue)
    private var nBins = 0

    /** Number of opened bins. */
    def size: Int = nBins

    /** Remaining capacity of an opened bin. */
    def remaining(bin: Int): Long = {
      require(bin >= 0 && bin < nBins, s"bin $bin not opened (have $nBins)")
      tree(cap + bin)
    }

    /** Lowest-indexed opened bin with remaining ≥ need, or -1. */
    def findFirst(need: Long): Int = {
      if (tree(1) < need) return -1
      var i = 1
      while (i < cap) i = if (tree(2 * i) >= need) 2 * i else 2 * i + 1
      i - cap
    }

    /** Set a bin's remaining capacity; `bin == size` opens the next bin. */
    def set(bin: Int, rem: Long): Unit = {
      require(bin >= 0 && bin <= nBins && bin < cap,
        s"bin $bin out of range (opened $nBins, capacity $cap)")
      if (bin == nBins) nBins += 1
      var i = cap + bin
      tree(i) = rem
      i /= 2
      while (i >= 1) {
        tree(i) = math.max(tree(2 * i), tree(2 * i + 1))
        i /= 2
      }
    }
  }

  /** Per-bin fill summary over [[packBestFit]] output — [[packSummary]]'s
    * twin for the non-splitting layout: n_docs, token total and fill
    * ratio per bin. Interior bins fill ≤ 1.0 (the padding-waste view);
    * an oversized single-document bin reports > 1.0.
    */
  def packBestFitSummary(packed: DataFrame, blockLen: Int): DataFrame =
    packed.groupBy("source", "shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        (sum("n_tokens") / lit(blockLen.toDouble)).as("fill_ratio"))

  /** Fixed-length token chunking with overlap — [[packBlocks]]'s
    * inference-side twin (RAG / embedding-index ingestion slices each
    * document into `chunkLen`-token windows advancing by
    * `chunkLen − overlap`, so retrieval context never cuts mid-window
    * without a carried margin). Chunk i of a document covers tokens
    * `[i·stride, min(i·stride + chunkLen, n))`; every document yields at
    * least one chunk (a short one yields exactly one).
    *
    * Entirely NARROW — tokenize, per-row chunk-count arithmetic (all
    * integer, so any engine replays it exactly), explode onto chunk
    * indices, slice + rejoin. No shuffle, no window, no driver state:
    * at 100 TB this is a pure scan whose output is ≈ rows·(n/stride).
    *
    * Output: (doc_id, chunk, tok_start, tok_end, n_chunk_tokens,
    * chunk_text) with `chunk_text` the whitespace-rejoined token slice
    * (the tokenizer is whitespace-split, so rejoining is lossless up to
    * whitespace normalization — the same canonicalization every
    * downstream text stage here uses).
    */
  def chunkTokens(
      docs: DataFrame,
      chunkLen: Int,
      overlap: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(chunkLen > 0, s"chunkLen must be positive, got $chunkLen")
    require(overlap >= 0 && overlap < chunkLen,
      s"overlap must be in [0, chunkLen), got $overlap for chunkLen $chunkLen")
    val stride = (chunkLen - overlap).toLong
    docs
      .select(col(idCol).cast(LongType).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast(LongType))
      // integer ceil((n − overlap)/stride), floored at one chunk
      .withColumn("__nc",
        greatest(lit(1L),
          floor((col("__n") - lit(overlap.toLong) + lit(stride - 1L)) / lit(stride))
            .cast(LongType)))
      .withColumn("chunk", explode(sequence(lit(0L), col("__nc") - lit(1L))))
      .withColumn("tok_start", col("chunk") * lit(stride))
      .withColumn("tok_end", least(col("tok_start") + lit(chunkLen.toLong), col("__n")))
      .select(col("doc_id"), col("chunk"), col("tok_start"), col("tok_end"),
        (col("tok_end") - col("tok_start")).as("n_chunk_tokens"),
        array_join(slice(col("__toks"), (col("tok_start") + lit(1L)).cast("int"),
          (col("tok_end") - col("tok_start")).cast("int")), " ").as("chunk_text"))
  }
}
