package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object TextStatsKernel {
  /** en stopword list — must stay in sync with the text_stats oracle SQL. */
  val EnStop: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "a", "of", "and", "to", "in", "is").foreach(s.add)
    s
  }

  @inline private def isAsciiPunct(cp: Int): Boolean =
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) || (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)

  /** One pass: (n_tokens, n_chars, punct_cnt, stop_cnt, tok_len_sum).
    * Semantics identical to the composable formulation:
    * tokens = split(trim(text), "\\s+") (case preserved), lengths and
    * punctuation in codepoints, punct class = the ASCII ranges of
    * `[!-/:-@\[-`{-~]`.
    */
  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    var nChars = 0L
    var punct = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (isAsciiPunct(cp)) punct += 1
      i += Character.charCount(cp)
    }
    val toks = ShingleKernel.sqlTrim(s).split("\\s+")
    var stopCnt = 0L
    var tokLenSum = 0L
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (EnStop.contains(tok)) stopCnt += 1
      tokLenSum += tok.codePointCount(0, tok.length)
      t += 1
    }
    new GenericInternalRow(Array[Any](toks.length.toLong, nChars, punct, stopCnt, tokLenSum))
  }
}

/** text → struct of corpus-statistics counters in one pass. */
case class TextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("punct_cnt", LongType, nullable = false),
    StructField("stop_cnt", LongType, nullable = false),
    StructField("tok_len_sum", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_stats"

  override def nullSafeEval(a: Any): Any =
    TextStatsKernel.stats(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextStatsKernel.stats($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
