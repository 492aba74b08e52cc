package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

object PcaKernel {
  /** y = components · (v − mean): one fused center-and-project pass in
    * double arithmetic, emitted as `array<float>` of length
    * `components.length`. The model matrices ride as codegen reference
    * objects (like [[PqEncodeKernel]]'s codebooks) — no plan-sized
    * literals, WholeStageCodegen intact. Fails loudly on a dimension
    * mismatch: silently truncating would project garbage.
    */
  def project(v: ArrayData, mean: Array[Double], comps: Array[Array[Double]]): ArrayData = {
    val va = v.toFloatArray()
    require(va.length == mean.length,
      s"vector dim ${va.length} != PCA model dim ${mean.length}")
    val out = new Array[Float](comps.length)
    var k = 0
    while (k < comps.length) {
      val row = comps(k)
      var acc = 0.0
      var i = 0
      while (i < va.length) { acc += row(i) * (va(i) - mean(i)); i += 1 }
      out(k) = acc.toFloat
      k += 1
    }
    new GenericArrayData(out)
  }

  /** One fused pass computing both the projection and the residual norm
    * (see [[PcaProjectResidual]]): y = comps·(v−μ) with double
    * accumulators, r = √(max(0, ‖v−μ‖² − ‖y‖²)) — the max() absorbs
    * full-rank cancellation crumbs. Returned as an InternalRow
    * (proj float[], presidual double).
    */
  def projectResidual(v: ArrayData, mean: Array[Double],
      comps: Array[Array[Double]]): org.apache.spark.sql.catalyst.InternalRow = {
    val va = v.toFloatArray()
    require(va.length == mean.length,
      s"vector dim ${va.length} != PCA model dim ${mean.length}")
    val centered = new Array[Double](va.length)
    var c2 = 0.0
    var i = 0
    while (i < va.length) {
      val c = va(i) - mean(i)
      centered(i) = c
      c2 += c * c
      i += 1
    }
    val out = new Array[Float](comps.length)
    var y2 = 0.0
    var k = 0
    while (k < comps.length) {
      val row = comps(k)
      var acc = 0.0
      i = 0
      while (i < va.length) { acc += row(i) * centered(i); i += 1 }
      out(k) = acc.toFloat
      y2 += acc * acc
      k += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(out), math.sqrt(math.max(0.0, c2 - y2)))
  }

  /** v̂ = mean + componentsᵀ · y — the inverse map of [[project]] (exact
    * for a full-rank model, least-squares optimal for a truncated one).
    */
  def reconstruct(y: ArrayData, mean: Array[Double], comps: Array[Array[Double]]): ArrayData = {
    val ya = y.toFloatArray()
    require(ya.length == comps.length,
      s"projected dim ${ya.length} != PCA component count ${comps.length}")
    val out = new Array[Double](mean.length)
    System.arraycopy(mean, 0, out, 0, mean.length)
    var k = 0
    while (k < ya.length) {
      val row = comps(k)
      val c = ya(k).toDouble
      var i = 0
      while (i < out.length) { out(i) += c * row(i); i += 1 }
      k += 1
    }
    val outF = new Array[Float](out.length)
    var i = 0
    while (i < out.length) { outF(i) = out(i).toFloat; i += 1 }
    new GenericArrayData(outF)
  }
}

/** `array<float>` vector → `struct(proj array<float>, presidual double)` in
  * ONE pass: the PCA projection plus the residual norm
  * r = ‖v − v̂‖ = √(‖v−μ‖² − ‖y‖²) (Pythagoras in the eigenbasis — the
  * orthonormal-row identity, so no reconstruction pass is needed). `r` is
  * what makes truncated-PCA search PROVABLY exact:
  * d(q,v)² = d_proj(q,v)² + d_res(q,v)² with d_res ∈ [|r_q−r_v|, r_q+r_v],
  * giving data-independent lower/upper bounds per pair
  * ([[graft.knn.Pca.searchExact]]).
  */
case class PcaProjectResidual(child: Expression, mean: Array[Double], comps: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = PcaProjectResidual.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pca_project_residual"

  override def nullSafeEval(a: Any): Any =
    PcaKernel.projectResidual(a.asInstanceOf[ArrayData], mean, comps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val compsRef = ctx.addReferenceObj("pcaComps", comps, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"graft.functions.PcaKernel.projectResidual($a, $meanRef, $compsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcaProjectResidual {
  import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
  val schema: StructType = StructType(Seq(
    StructField("proj", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("presidual", DoubleType, nullable = false)))
}

/** `array<float>` vector → its PCA projection (`array<float>`, dOut dims). */
case class PcaProject(child: Expression, mean: Array[Double], comps: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pca_project"

  override def nullSafeEval(a: Any): Any =
    PcaKernel.project(a.asInstanceOf[ArrayData], mean, comps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val compsRef = ctx.addReferenceObj("pcaComps", comps, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PcaKernel.project($a, $meanRef, $compsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<float>` projection → reconstructed vector (`array<float>`, dim). */
case class PcaReconstruct(child: Expression, mean: Array[Double], comps: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pca_reconstruct"

  override def nullSafeEval(a: Any): Any =
    PcaKernel.reconstruct(a.asInstanceOf[ArrayData], mean, comps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val compsRef = ctx.addReferenceObj("pcaComps", comps, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PcaKernel.reconstruct($a, $meanRef, $compsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
