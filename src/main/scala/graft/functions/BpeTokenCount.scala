package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object BpeKernel {
  /** Per-JVM interned merges table: the spec string is resolved ONCE to a
    * small-integer id + parsed rank map (same executor-side-rebuild
    * pattern as [[StopwordCountsKernel]]), so a production 50k-rule GPT-2
    * table costs one parse per executor and downstream cache keys never
    * touch the (potentially hundreds-of-KB) spec content again.
    */
  private final class SpecEntry(val id: java.lang.Integer,
      val ranks: Map[(String, String), Int],
      val byteLevel: Boolean)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, SpecEntry]()
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Reference-equality fast path: codegen deserializes ONE spec String
    * per task and passes that same instance every row, so after the first
    * row of a task this resolves in O(1) with zero content compares.
    * Per-THREAD memo, not a shared slot — concurrent tasks hold different
    * String instances of the same spec, so a shared slot would thrash
    * between them and every miss pays a full spec-length `equals` in the
    * map probe (at a production 50k-merge ≈0.5 MB spec, a per-row memcmp
    * that dominates the scan). One task per thread makes the ThreadLocal
    * hit by reference on every row after the task's first.
    */
  private val lastResolved = new ThreadLocal[(String, SpecEntry)]()

  private val pattern =
    java.util.regex.Pattern.compile(graft.text.TextAnalysis.BpeTokenPattern)

  /** Mode header marking a spec as BYTE-LEVEL (GPT-2 bytes→unicode +
    * the published split regex). A '#'-prefixed line, so [[graft.text.Bpe.loadMerges]]
    * skips it without consuming a rank — the mode rides INSIDE the spec
    * string, keeping kernel entrypoints and cache keys mode-aware for
    * free (each mode gets its own interned id).
    */
  private val ByteLevelHeader = "#graft-mode: bytes"

  def encode(mergeLines: Seq[String]): String = encode(mergeLines, byteLevel = false)

  def encode(mergeLines: Seq[String], byteLevel: Boolean): String = {
    val body = mergeLines.mkString("\n")
    if (byteLevel) ByteLevelHeader + "\n" + body else body
  }

  private def entry(spec: String): SpecEntry = {
    val l = lastResolved.get()
    if (l != null && (l._1 eq spec)) l._2
    else {
      val e = entries.computeIfAbsent(spec, s =>
        new SpecEntry(nextId.getAndIncrement(),
          graft.text.Bpe.loadMerges(s.split("\n", -1)),
          s.startsWith(ByteLevelHeader)))
      lastResolved.set((spec, e))
      e
    }
  }

  /** Pretoken → pieces memo (the cache every production BPE tokenizer
    * ships): natural-language pretokens are Zipf-distributed, so the
    * quadratic-ish merge loop runs once per DISTINCT pretoken per
    * executor instead of once per occurrence. Keyed by (internedSpecId,
    * pretoken) — an O(1) int compare plus the pretoken, never the spec
    * content, so a cache hit stays cheaper than re-encoding even under a
    * production-sized merges table. BOUNDED — an adversarial corpus of
    * unique pretokens stops inserting at the cap instead of growing
    * executor memory, and encodes exactly as before. Values are the
    * already-UTF8-encoded piece arrays, shared (never mutated) across rows.
    */
  private val pieceCache =
    new java.util.concurrent.ConcurrentHashMap[(java.lang.Integer, String), Array[UTF8String]]()
  private val MaxCacheEntries = 1 << 16

  private def encodeCached(pretoken: String, e: SpecEntry): Array[UTF8String] = {
    val key = (e.id, pretoken)
    val hit = pieceCache.get(key)
    if (hit != null) hit
    else {
      val ps =
        if (e.byteLevel) graft.text.Bpe.encodeByteTokens(pretoken, e.ranks)
        else graft.text.Bpe.encodeTokens(pretoken, e.ranks)
      val enc = new Array[UTF8String](ps.length)
      var i = 0
      while (i < ps.length) { enc(i) = UTF8String.fromString(ps(i)); i += 1 }
      if (pieceCache.size < MaxCacheEntries) pieceCache.put(key, enc)
      enc
    }
  }

  private def matcherFor(e: SpecEntry, text: String): java.util.regex.Matcher =
    (if (e.byteLevel) graft.text.Bpe.Gpt2SplitCompiled else pattern).matcher(text)

  /** One pretokenize pass; per-pretoken BPE encode; summed token count. */
  def count(text: UTF8String, spec: String): Long = {
    val e = entry(spec)
    val m = matcherFor(e, text.toString)
    var total = 0L
    while (m.find()) total += encodeCached(m.group(), e).length
    total
  }

  /** One pretokenize pass; per-pretoken BPE encode; concatenated PIECES
    * (GPT-2 byte-level convention, space → Ġ) in document order. */
  def pieces(text: UTF8String, spec: String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val e = entry(spec)
    val m = matcherFor(e, text.toString)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    while (m.find()) {
      val ps = encodeCached(m.group(), e)
      var i = 0
      while (i < ps.length) { out += ps(i); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** text → REAL BPE token count (`long`) under a standard merges table —
  * one kernel pass: pretokenize with [[graft.text.TextAnalysis.BpeTokenPattern]],
  * run the published BPE merge loop per pretoken, sum. Merge lines must
  * not contain '\n' (they are newline-joined into the spec literal).
  */
case class BpeTokenCount(child: Expression, mergeLines: Seq[String],
    byteLevel: Boolean = false) extends UnaryExpression {
  private val spec = BpeKernel.encode(mergeLines, byteLevel)
  require(!mergeLines.exists(_.contains("\n")), "merge lines must not contain newlines")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(a: Any): Any =
    BpeKernel.count(a.asInstanceOf[UTF8String], spec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val specRef = ctx.addReferenceObj("bpeMergesSpec", spec, "java.lang.String")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BpeKernel.count($a, $specRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → the full BPE token PIECE array (`array<string>`, GPT-2 space→Ġ
  * convention) under the same merges table as [[BpeTokenCount]] — the
  * tokenizer output itself, for piece-level pipelines (vocabulary audits,
  * piece-length stats, id mapping through a vocab join). `size(pieces)`
  * equals [[BpeTokenCount]] by construction (countTokens delegates to the
  * piece encoder), and the pieces reconstruct the input exactly.
  */
case class BpeTokens(child: Expression, mergeLines: Seq[String],
    byteLevel: Boolean = false) extends UnaryExpression {
  private val spec = BpeKernel.encode(mergeLines, byteLevel)
  require(!mergeLines.exists(_.contains("\n")), "merge lines must not contain newlines")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(a: Any): Any =
    BpeKernel.pieces(a.asInstanceOf[UTF8String], spec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val specRef = ctx.addReferenceObj("bpeMergesSpec", spec, "java.lang.String")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BpeKernel.pieces($a, $specRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
