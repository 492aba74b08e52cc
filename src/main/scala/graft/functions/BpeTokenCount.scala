package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

object BpeKernel {
  /** Merge tables parsed lazily once per JVM from their spec string (same
    * executor-side-rebuild pattern as [[StopwordCountsKernel]]): a
    * production 50k-rule GPT-2 table costs one parse per executor, not
    * one per row or per task.
    */
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, Map[(String, String), Int]]()

  private val pattern =
    java.util.regex.Pattern.compile(graft.text.TextAnalysis.BpeTokenPattern)

  def encode(mergeLines: Seq[String]): String = mergeLines.mkString("\n")

  private def table(spec: String): Map[(String, String), Int] =
    tables.computeIfAbsent(spec, s => graft.text.Bpe.loadMerges(s.split("\n", -1)))

  /** One pretokenize pass; per-pretoken BPE encode; summed token count. */
  def count(text: UTF8String, spec: String): Long = {
    val ranks = table(spec)
    val m = pattern.matcher(text.toString)
    var total = 0L
    while (m.find()) total += graft.text.Bpe.countTokens(m.group(), ranks)
    total
  }
}

/** text → REAL BPE token count (`long`) under a standard merges table —
  * one kernel pass: pretokenize with [[graft.text.TextAnalysis.BpeTokenPattern]],
  * run the published BPE merge loop per pretoken, sum. Merge lines must
  * not contain '\n' (they are newline-joined into the spec literal).
  */
case class BpeTokenCount(child: Expression, mergeLines: Seq[String]) extends UnaryExpression {
  private val spec = BpeKernel.encode(mergeLines)
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
