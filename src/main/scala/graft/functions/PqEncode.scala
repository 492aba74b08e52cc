package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

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

object VecResidualKernel {
  /** vector − centroids(cell), elementwise in float — the IVFADC residual
    * (Jégou et al. 2011 §IV.A: quantize what the coarse quantizer missed,
    * not the raw vector). Fails loudly on an out-of-range cell or a
    * dimension mismatch: a silent zero-fill would encode garbage codes.
    */
  def residual(v: ArrayData, cell: Int, centroids: Array[Array[Float]]): ArrayData = {
    require(cell >= 0 && cell < centroids.length,
      s"cell $cell outside centroid range 0..${centroids.length - 1}")
    val va = v.toFloatArray()
    val c = centroids(cell)
    require(va.length == c.length, s"vector dim ${va.length} != centroid dim ${c.length}")
    val out = new Array[Float](va.length)
    var i = 0
    while (i < va.length) { out(i) = va(i) - c(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** (`array<float>` vector, `int` cell) → vector − centroids(cell). The
  * centroid table rides as a codegen reference object like [[PqEncode]]'s
  * codebooks — no plan-sized literals, WholeStageCodegen intact.
  */
case class VecResidual(left: Expression, right: Expression, centroids: Array[Array[Float]])
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_residual"

  override def nullSafeEval(v: Any, cell: Any): Any =
    VecResidualKernel.residual(v.asInstanceOf[ArrayData], cell.asInstanceOf[Int], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centroidsRef = ctx.addReferenceObj("residualCentroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, (v, cell) =>
      s"${ev.value} = graft.functions.VecResidualKernel.residual($v, $cell, $centroidsRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
