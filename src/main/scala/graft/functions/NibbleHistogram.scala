package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.types._

object NibbleHistogramKernel {
  /** 16-bin histogram of the high nibbles of the first `covered` bytes —
    * one pass over the raw binary, no string materialization. Used as the
    * independent declarative check of the multimodal feature kernel
    * (Multimodal.extractFeatures builds the same histogram via the decode
    * path; the two implementations share no code).
    */
  def hist(payload: Array[Byte], covered: Int): UnsafeArrayData = {
    val h = new Array[Long](16)
    val n = math.min(math.max(covered, 0), payload.length)
    var i = 0
    while (i < n) {
      h((payload(i) & 0xff) >> 4) += 1
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(h)
  }
}

/** (payload: binary, covered: int) → array<long>[16] high-nibble histogram. */
case class NibbleHistogram(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nibble_histogram"

  override def nullSafeEval(payload: Any, covered: Any): Any =
    NibbleHistogramKernel.hist(payload.asInstanceOf[Array[Byte]], covered.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, c) =>
      s"${ev.value} = graft.functions.NibbleHistogramKernel.hist($p, $c);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
