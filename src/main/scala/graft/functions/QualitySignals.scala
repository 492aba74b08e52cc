package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Gopher/C4 quality-signal kernel.
  *
  * The composable formulation re-tokenizes the document once per signal
  * (a regex split each for token count, mean word length and the 3-gram
  * repetition set) and runs three full `regexp_replace` scans for the
  * character-class ratios — ~7 passes over every byte of a 100 TB corpus.
  * This kernel computes all eight signals in one tokenize + one character
  * scan + one line scan per document.
  *
  * Every field reproduces the composable/DuckDB semantics bit-for-bit:
  * tokens are `split(lower(trim(text)), "\s+")` via [[ShingleKernel.tokenize]]
  * (SQL trim = U+0020 only), lines are `split(text, "\n", -1)` (trailing
  * empties kept), lengths count codepoints, `ltrim`/`rtrim` in the line
  * predicates strip spaces only, and the ellipsis count uses the same
  * non-overlapping greedy scan as SQL `replace(text, '...', '')`.
  */
object QualitySignalsKernel {

  private def countEllipses(s: String): Int = {
    var cnt = 0
    var i = s.indexOf("...")
    while (i >= 0) {
      cnt += 1
      i = s.indexOf("...", i + 3)
    }
    cnt
  }

  @inline private def ltrimSp(s: String): String = {
    var b = 0
    while (b < s.length && s.charAt(b) == ' ') b += 1
    if (b == 0) s else s.substring(b)
  }

  @inline private def rtrimSp(s: String): String = {
    var e = s.length
    while (e > 0 && s.charAt(e - 1) == ' ') e -= 1
    if (e == s.length) s else s.substring(0, e)
  }

  def signals(text: UTF8String): InternalRow = {
    val s = text.toString

    // character scan: codepoint length + class counts + '#' count
    var nChars = 0L
    var upper = 0L
    var digit = 0L
    var alpha = 0L
    var hashes = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (cp >= 'A' && cp <= 'Z') { upper += 1; alpha += 1 }
      else if (cp >= 'a' && cp <= 'z') alpha += 1
      else if (cp >= '0' && cp <= '9') digit += 1
      if (cp == '#') hashes += 1
      i += Character.charCount(cp)
    }

    // token pass: count, codepoint-length sum, distinct 3-gram hashes
    val toks = ShingleKernel.tokenize(text)
    val nTok = toks.length
    var tokLenSum = 0 // Int on purpose: matches aggregate(toks, lit(0), …)
    var t = 0
    while (t < nTok) {
      val tok = toks(t)
      tokLenSum += tok.codePointCount(0, tok.length)
      t += 1
    }
    val rep3 =
      if (nTok < 3) 0.0
      else {
        val hs = ShingleKernel.shingleHashesFromTokens(toks, 3)
        java.util.Arrays.sort(hs)
        var distinct = 0
        var r = 0
        while (r < hs.length) {
          if (r == 0 || hs(r) != hs(r - 1)) distinct += 1
          r += 1
        }
        1.0 - distinct.toDouble / (nTok - 2).toDouble
      }

    // line pass (split("\n", -1) keeps trailing empties; empty text = 1 line)
    val lines = s.split("\n", -1)
    var bullet = 0
    var ellipsisEnd = 0
    var l = 0
    while (l < lines.length) {
      val lt = ltrimSp(lines(l))
      if (lt.startsWith("- ") || lt.startsWith("* ") || lt.startsWith("• ")) bullet += 1
      if (rtrimSp(lines(l)).endsWith("...")) ellipsisEnd += 1
      l += 1
    }
    val nLines = lines.length.toDouble

    val nTokD = nTok.toDouble
    new GenericInternalRow(Array[Any](
      rep3,
      if (nChars == 0L) 0.0 else upper.toDouble / nChars.toDouble,
      if (nChars == 0L) 0.0 else digit.toDouble / nChars.toDouble,
      if (nChars == 0L) 0.0 else alpha.toDouble / nChars.toDouble,
      tokLenSum.toDouble / nTokD,
      (hashes.toDouble + countEllipses(s).toDouble) / nTokD,
      bullet.toDouble / nLines,
      ellipsisEnd.toDouble / nLines))
  }
}

/** text → struct of all eight quality-filter signals in one pass. */
case class QualitySignals(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("rep3_ratio", DoubleType, nullable = false),
    StructField("upper_ratio", DoubleType, nullable = false),
    StructField("digit_ratio", DoubleType, nullable = false),
    StructField("alpha_ratio", DoubleType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbol_word_ratio", DoubleType, nullable = false),
    StructField("bullet_line_frac", DoubleType, nullable = false),
    StructField("ellipsis_line_frac", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quality_signals"

  override def nullSafeEval(a: Any): Any =
    QualitySignalsKernel.signals(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.QualitySignalsKernel.signals($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
