package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text → shingle-hash kernels.
  *
  * The composable HOF pipeline (`split` → `sequence` → `transform` →
  * `concat_ws` → hash) costs ~2ms/doc in expression-tree overhead and gets
  * freely duplicated by CollapseProject; these kernels do tokenize + n-gram
  * + hash in one JVM loop (~µs/doc) so recomputation is harmless.
  *
  * Hash compatibility: a shingle's hash equals
  * [[SetSimilarityKernel.hashedShingleSet]] applied to the same
  * space-joined shingle string — Murmur3(utf8-bytes, 42) xor-folded with the
  * byte length, then mixed — so hashed Jaccard here equals string-set
  * Jaccard absent 64-bit collisions.
  */
object ShingleKernel {

  /** SQL `trim` strips only ' ' (U+0020); Java's `String.trim` also strips
    * tab/newline, which would drop the leading/trailing empty token the SQL
    * split keeps. Kernel tokenization must match the SQL/DuckDB paths
    * byte-for-byte on every input, so trim spaces only.
    */
  def sqlTrim(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  def tokenize(text: UTF8String): Array[String] =
    sqlTrim(text.toString).toLowerCase(java.util.Locale.ROOT).split("\\s+")

  private def hashShingle(s: String): Long = {
    val u = UTF8String.fromString(s)
    val base = Murmur3_x86_32.hashUnsafeBytes2(u.getBaseObject, u.getBaseOffset, u.numBytes, 42).toLong
    SetSimilarityKernel.mix(base ^ (u.numBytes.toLong << 32))
  }

  /** All shingle hashes (with duplicates), in document order. */
  def shingleHashesRaw(text: UTF8String, n: Int): Array[Long] =
    shingleHashesFromTokens(tokenize(text), n)

  /** Shingle hashes over an already-tokenized document — lets fused
    * kernels that need tokens for other signals tokenize exactly once.
    */
  def shingleHashesFromTokens(toks: Array[String], n: Int): Array[Long] = {
    if (toks.length < n) {
      Array(hashShingle(toks.mkString(" ")))
    } else {
      val out = new Array[Long](toks.length - n + 1)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < out.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = hashShingle(sb.toString)
        i += 1
      }
      out
    }
  }

  /** Distinct ascending shingle-hash set. */
  def shingleHashSet(text: UTF8String, n: Int): UnsafeArrayData = {
    val hs = shingleHashesRaw(text, n)
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < hs.length) {
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, w))
  }

  /** MinHash band hashes straight from text (single pass over shingles). */
  def shingleBandHashes(text: UTF8String, n: Int, bands: Int, rowsPerBand: Int): UnsafeArrayData = {
    val numHashes = bands * rowsPerBand
    val minima = new Array[Long](numHashes)
    java.util.Arrays.fill(minima, Long.MaxValue)
    val raw = shingleHashesRaw(text, n)
    var s = 0
    while (s < raw.length) {
      val full = raw(s)
      var h = 0
      while (h < numHashes) {
        val v = SetSimilarityKernel.mix(full ^ (h.toLong * 0x9e3779b97f4a7c15L))
        if (v < minima(h)) minima(h) = v
        h += 1
      }
      s += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var r = 0
      while (r < rowsPerBand) {
        acc = SetSimilarityKernel.mix(acc ^ minima(b * rowsPerBand + r))
        r += 1
      }
      out(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** text → the space-joined word n-GRAM STRINGS in document order
  * (`array<string>`; empty when the document has fewer than n tokens) — the
  * fused form of `transform(sequence(...), i -> concat_ws(' ',
  * slice(split(lower(trim(text)), '\\s+'), i+1, n)))`. Tokenization and
  * joining go through the SAME UTF8String operations the SQL chain
  * compiles to (`trim` = strip U+0020 only, `lower` = UTF8String
  * lowercasing, `split(_, -1)`, `concatWs`), so the gram strings are
  * byte-identical to the HOF formulation's — but in ONE kernel pass
  * instead of a five-expression tree re-walked per gram index.
  */
object WordNgrams {
  private val WS = org.apache.spark.unsafe.types.UTF8String.fromString("\\s+")
  private val SPACE = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** The SQL-parity tokenization both gram kernels share: UTF8String
    * `trim` (strips U+0020 only) → `toLowerCase` → `split("\\s+", -1)` —
    * the exact operations `split(lower(trim(text)), "\\s+")` evaluates.
    */
  private[functions] def sqlTokens(text: UTF8String): Array[UTF8String] =
    text.trim().toLowerCase().split(WS, -1)

  /** The space-joined window [i, i+n) of `toks` — `concat_ws(" ", ...)`'s
    * own join. */
  private[functions] def joinWindow(toks: Array[UTF8String], i: Int, n: Int): UTF8String = {
    val window = new Array[UTF8String](n)
    System.arraycopy(toks, i, window, 0, n)
    UTF8String.concatWs(SPACE, window: _*)
  }

  def grams(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = sqlTokens(text)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      out(i) = joinWindow(toks, i, n)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object WordShingleSet {
  /** DISTINCT word n-gram strings in first-occurrence order, with the
    * short-doc rule (fewer than n tokens ⇒ the whole token list as one
    * shingle) — the fused form of
    * `array_distinct(when(size(t) < n, array(concat_ws(' ', t)))
    * .otherwise(transform(..., concat_ws(' ', slice(...)))))`
    * over the same UTF8String operations; byte-identical elements.
    */
  def shingles(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = WordNgrams.sqlTokens(text)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (toks.length < n) {
      out.add(WordNgrams.joinWindow(toks, 0, toks.length))
    } else {
      var i = 0
      val last = toks.length - n
      while (i <= last) {
        out.add(WordNgrams.joinWindow(toks, i, n))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }
}

/** text → distinct word n-gram shingle strings (`array<string>`). */
case class WordShingleSet(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingle_set"

  override def nullSafeEval(a: Any): Any =
    WordShingleSet.shingles(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordShingleSet.shingles($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → word n-gram strings (`array<string>`), the [[WordNgrams.grams]]
  * kernel as an expression. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(a: Any): Any =
    WordNgrams.grams(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordNgrams.grams($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → ALL shingle hashes in document order, duplicates kept
  * (`array<long>`) — element i is the hash of the n-gram starting at
  * token i, which is what positional span-level operators (exact
  * substring dedup) consume. Same hash as [[ShingleHashSet]].
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(a: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      ShingleKernel.shingleHashesRaw(a.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.ShingleKernel.shingleHashesRaw($a, $n));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → distinct sorted shingle-hash set (`array<long>`). */
case class ShingleHashSet(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hash_set"

  override def nullSafeEval(a: Any): Any =
    ShingleKernel.shingleHashSet(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleKernel.shingleHashSet($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → MinHash band hashes (`array<long>`, one element per band). */
case class ShingleBandHashes(child: Expression, n: Int, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_band_hashes"

  override def nullSafeEval(a: Any): Any =
    ShingleKernel.shingleBandHashes(a.asInstanceOf[UTF8String], n, bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleKernel.shingleBandHashes($a, $n, $bands, $rowsPerBand);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
