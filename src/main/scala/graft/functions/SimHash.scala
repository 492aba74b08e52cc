package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash fingerprint (Charikar, STOC 2002) over per-token hash values:
  * for each bit b, sum +1/-1 across token hashes by bit b; result bit b is 1
  * iff the sum is positive. Operates on `array<long>` (token hashes computed
  * upstream with any engine-reproducible hash, e.g. md5-derived), emitting a
  * `nbits`-bit long. Codegen'd: one pass over the array per row.
  */
case class SimHash64(child: Expression, nbits: Int = 60) extends UnaryExpression {
  require(nbits > 0 && nbits <= 63, "nbits must be in 1..63")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](nbits)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < nbits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < nbits) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val out = ctx.freshName("out")
      s"""
       |int $n = $a.numElements();
       |int[] $counts = new int[$nbits];
       |for (int $i = 0; $i < $n; $i++) {
       |  long $h = $a.getLong($i);
       |  for (int $b = 0; $b < $nbits; $b++) {
       |    if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
       |  }
       |}
       |long $out = 0L;
       |for (int $b = 0; $b < $nbits; $b++) {
       |  if ($counts[$b] > 0) $out |= (1L << $b);
       |}
       |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
