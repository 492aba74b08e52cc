package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

object StopwordCountsKernel {
  /** Word-list tables parsed lazily per JVM from their spec string, so the
    * kernel works on executors that never saw the driver-side expression
    * object (generated code carries only the spec literal).
    */
  private val tables = new java.util.concurrent.ConcurrentHashMap[String, Array[java.util.HashSet[String]]]()

  /** spec = lists joined by ';', words by ','. */
  def encode(lists: Seq[Seq[String]]): String = lists.map(_.mkString(",")).mkString(";")

  private def table(spec: String): Array[java.util.HashSet[String]] =
    tables.computeIfAbsent(spec, s => s.split(";", -1).map { ws =>
      val set = new java.util.HashSet[String]()
      ws.split(",", -1).foreach(set.add)
      set
    })

  /** One tokenize pass; per-list membership counts. */
  def counts(text: UTF8String, spec: String): UnsafeArrayData = {
    val sets = table(spec)
    val out = new Array[Long](sets.length)
    val toks = ShingleKernel.tokenize(text)
    var t = 0
    while (t < toks.length) {
      var l = 0
      while (l < sets.length) {
        if (sets(l).contains(toks(t))) out(l) += 1
        l += 1
      }
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** text → `array<long>` of per-word-list token membership counts, one
  * tokenize pass (used by language-ID and quality scoring; the equivalent
  * N× `size(filter(tokens, isin(...)))` HOF chain re-tokenizes per list).
  * Word lists must not contain ',' or ';'.
  */
case class StopwordCounts(child: Expression, lists: Seq[Seq[String]]) extends UnaryExpression {
  private val spec = StopwordCountsKernel.encode(lists)
  require(!lists.exists(_.exists(w => w.contains(",") || w.contains(";"))),
    "stopwords must not contain ',' or ';'")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "stopword_counts"

  override def nullSafeEval(a: Any): Any =
    StopwordCountsKernel.counts(a.asInstanceOf[UTF8String], spec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val specRef = ctx.addReferenceObj("stopwordSpec", spec, "java.lang.String")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.StopwordCountsKernel.counts($a, $specRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
