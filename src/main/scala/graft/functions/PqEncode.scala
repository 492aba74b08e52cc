package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType}

object PqEncodeKernel {
  /** `array<float>` vector → m codeword indices (unsigned bytes), one
    * nearest-codeword scan per subspace. `books(j)(c)` = codeword c of
    * subspace j; carried as a codegen reference object, so generated code
    * shares the driver-built table.
    */
  def encode(v: ArrayData, books: Array[Array[Array[Float]]], dsub: Int): Array[Byte] = {
    val m = books.length
    val va = v.toFloatArray()
    require(va.length == m * dsub, s"vector dim ${va.length} != codebook dim ${m * dsub}")
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      var best = 0
      var bestD = Double.MaxValue
      var ci = 0
      while (ci < book.length) {
        val cw = book(ci)
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = va(j * dsub + t).toDouble - cw(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = ci }
        ci += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }
}

/** `array<float>` → product-quantization codes (`binary`, m bytes). */
case class PqEncode(child: Expression, books: Array[Array[Array[Float]]], dsub: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any): Any =
    PqEncodeKernel.encode(a.asInstanceOf[ArrayData], books, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PqEncodeKernel.encode($a, $booksRef, $dsub);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
