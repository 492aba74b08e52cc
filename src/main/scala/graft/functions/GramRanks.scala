package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object GramRanksKernel {
  /** The document's top-`k` character trigrams ordered by
    * (count DESC, gram ASC) — element i is the rank-(i+1) gram of the
    * Cavnar–Trenkle document profile, computed in ONE pass over the
    * (already normalized) text. Code-point trigrams, exactly the
    * `substr(t, i, 3)` the declarative form and the SQL oracle take, so
    * supplementary-plane characters count as one position, not two.
    * Texts shorter than one trigram return an empty array.
    */
  def topGrams(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    val cp = s.codePoints().toArray
    if (cp.length < 3) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i + 3 <= cp.length) {
      counts.merge(new String(cp, i, 3), 1,
        (a: Integer, b: Integer) => Integer.valueOf(a + b))
      i += 1
    }
    // ties break in UTF8String (binary UTF-8 = code point) order — the
    // exact order the declarative window's `col("gram")` sort and the
    // SQL oracle's ORDER BY use; java String.compareTo (UTF-16 units)
    // would diverge on supplementary-plane grams
    val entries = new java.util.ArrayList[(UTF8String, Int)](counts.size())
    counts.forEach((g, c) => entries.add((UTF8String.fromString(g), c.intValue())))
    entries.sort { (a: (UTF8String, Int), b: (UTF8String, Int)) =>
      val c = Integer.compare(b._2, a._2)
      if (c != 0) c else a._1.compareTo(b._1)
    }
    val m = math.min(k, entries.size)
    val out = new Array[Any](m)
    var j = 0
    while (j < m) { out(j) = entries.get(j)._1; j += 1 }
    new GenericArrayData(out)
  }
}

/** normalized text → its rank-ordered top-`k` trigram profile
  * (`array<string>`, element i = the rank-(i+1) gram). The fused form of
  * "explode trigrams → count per (doc, gram) → per-doc rank window →
  * rank ≤ k": one kernel pass per document instead of a corpus-sized
  * (doc, gram) shuffle plus a per-doc sort window — the profile that
  * reaches the plan is ≤ k rows per document.
  */
case class TopGramRanks(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "top_gram_ranks"

  override def nullSafeEval(a: Any): Any =
    GramRanksKernel.topGrams(a.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GramRanksKernel.topGrams($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
