package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Gopher REPETITION-REMOVAL kernel (Rae et al. 2021, Table A1
  * — the rule set their quality pipeline applies before the heuristic
  * filters): within-document duplicate line / paragraph fractions, the
  * character share of the single most frequent {2,3,4}-gram, and the
  * character COVERAGE of duplicated {5..10}-grams. The existing
  * `rep3_ratio` (distinct-3-gram fraction) is a cheaper cousin; these
  * are the published thresholds' exact inputs.
  *
  * Deterministic conventions, replayed verbatim by the SQL oracle:
  *  - `T` = codepoint length of the ORIGINAL text; every fraction is /T
  *    (counts-based fractions divide by their own totals); T = 0 → all 0.
  *  - lines = `split(text, "\n", -1)`; paragraphs = `split(text, "\n\n",
  *    -1)` (trailing empties kept, same as the quality kernel's lines).
  *  - a line/paragraph occurring c ≥ 2 times contributes its c−1 repeat
  *    INSTANCES to the duplicate count and c−1 × its codepoint length to
  *    the duplicate chars (the first occurrence is content, the repeats
  *    are the boilerplate).
  *  - tokens = `split(lower(trim(text)), "\s+")`
  *    ([[ShingleKernel.tokenize]]); a token's chars = its codepoints
  *    (separators excluded — in SQL, `len(gram) − (n−1)` of the
  *    space-joined gram, since tokens contain no whitespace).
  *  - top-n-gram fraction (n = 2,3,4): count × gram token chars / T for
  *    the most frequent n-gram, ties to the lexicographically smallest
  *    gram string (UTF-8 binary order — what SQL ORDER BY uses).
  *  - duplicate-n-gram fraction (n = 5..10): token positions covered by
  *    ANY occurrence of an n-gram appearing ≥ 2 times are marked once
  *    (overlaps not double-counted — the paper's "taking care not to
  *    double count" rule); fraction = covered token chars / T.
  */
object RepetitionSignalsKernel {

  @inline private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** (repeat instances, repeat chars, total parts) for one split level. */
  private def dupStats(parts: Array[String]): (Long, Long, Long) = {
    val counts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < parts.length) {
      counts.merge(parts(i), 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
      i += 1
    }
    var dup = 0L
    var dupChars = 0L
    counts.forEach { (content, c) =>
      if (c >= 2) {
        dup += c - 1
        dupChars += (c - 1).toLong * cpLen(content)
      }
    }
    (dup, dupChars, parts.length.toLong)
  }

  def signals(text: UTF8String): InternalRow = {
    val s = text.toString
    val t = cpLen(s).toDouble
    val out = new Array[Any](13)
    if (t == 0.0) {
      java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], java.lang.Double.valueOf(0.0))
      return new GenericInternalRow(out)
    }

    val (dupL, dupLChars, nL) = dupStats(s.split("\n", -1))
    val (dupP, dupPChars, nP) = dupStats(s.split("\n\n", -1))
    out(0) = dupL.toDouble / nL
    out(1) = dupLChars.toDouble / t
    out(2) = dupP.toDouble / nP
    out(3) = dupPChars.toDouble / t

    val toks = ShingleKernel.tokenize(text)
    val tokChars = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) { tokChars(i) = cpLen(toks(i)); i += 1 }

    // n = 2..4: the single most frequent n-gram's character share
    var n = 2
    while (n <= 4) {
      var frac = 0.0
      if (toks.length >= n) {
        val counts = new java.util.HashMap[String, Integer]()
        var p = 0
        while (p + n <= toks.length) {
          val g = joinGram(toks, p, n)
          counts.merge(g, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
          p += 1
        }
        var bestCnt = 0
        var bestGram: String = null
        counts.forEach { (g, c) =>
          if (c > bestCnt || (c == bestCnt && cpCompare(g, bestGram) < 0)) {
            bestCnt = c
            bestGram = g
          }
        }
        // tokens carry no whitespace, so gram chars = joined len − (n−1)
        frac = bestCnt.toDouble * (cpLen(bestGram) - (n - 1)) / t
      }
      out(2 + n) = frac // indices 4,5,6
      n += 1
    }

    // n = 5..10: char coverage of duplicated n-grams (positions marked once)
    n = 5
    while (n <= 10) {
      var frac = 0.0
      if (toks.length >= n) {
        val positions = new java.util.HashMap[String, java.util.ArrayList[Integer]]()
        var p = 0
        while (p + n <= toks.length) {
          positions.computeIfAbsent(joinGram(toks, p, n),
            (_: String) => new java.util.ArrayList[Integer]()).add(p)
          p += 1
        }
        val covered = new Array[Boolean](toks.length)
        positions.forEach { (_, ps) =>
          if (ps.size >= 2) {
            var q = 0
            while (q < ps.size) {
              val start = ps.get(q).intValue()
              var j = start
              while (j < start + n) { covered(j) = true; j += 1 }
              q += 1
            }
          }
        }
        var chars = 0L
        var k = 0
        while (k < toks.length) { if (covered(k)) chars += tokChars(k); k += 1 }
        frac = chars.toDouble / t
      }
      out(2 + n) = frac // indices 7..12
      n += 1
    }
    new GenericInternalRow(out)
  }

  /** Code-point order — identical to UTF-8 binary (what SQL ORDER BY and
    * UTF8String.compareTo use), without the per-gram allocation a
    * UTF8String round-trip would pay. null sorts last (initial best).
    */
  private def cpCompare(a: String, b: String): Int = {
    if (b == null) return -1
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  private def joinGram(toks: Array[String], start: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder()
    var i = start
    while (i < start + n) {
      if (i > start) sb.append(' ')
      sb.append(toks(i))
      i += 1
    }
    sb.toString
  }
}

/** text → struct of all 13 Gopher repetition signals in one pass. */
case class RepetitionSignals(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(
    Seq(
      StructField("dup_line_frac", DoubleType, nullable = false),
      StructField("dup_line_char_frac", DoubleType, nullable = false),
      StructField("dup_para_frac", DoubleType, nullable = false),
      StructField("dup_para_char_frac", DoubleType, nullable = false)) ++
      (2 to 4).map(n => StructField(s"top${n}gram_char_frac", DoubleType, nullable = false)) ++
      (5 to 10).map(n => StructField(s"dup${n}gram_char_frac", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_signals"

  override def nullSafeEval(a: Any): Any =
    RepetitionSignalsKernel.signals(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RepetitionSignalsKernel.signals($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
