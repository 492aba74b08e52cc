package graft.functions

import graft.core.{DistKernel, Distances}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static entry the generated code calls: ArrayData → primitive float
  * arrays → the best available [[DistKernel]] (Panama SIMD when the
  * incubator module is present, scalar otherwise — the Spark analog of the
  * reference's CPU dispatch, `index/space/space.go:23-31`).
  */
object SimdDistOps {
  private val kernel = DistKernel.best

  def dist(a: ArrayData, b: ArrayData, metric: Int): Double = {
    val af = a.toFloatArray()
    val bf = b.toFloatArray()
    metric match {
      case Distances.Euclidean => kernel.euclidean(af, bf)
      case Distances.Manhattan => kernel.manhattan(af, bf)
      case _ => kernel.cosine(af, bf)
    }
  }
}

/** SIMD-dispatched distance over `array<float>` columns. RELAXED precision:
  * lane-parallel accumulation reorders the float sum, so results differ from
  * [[VectorDistance]] (the exact element-ordered double fold) by O(dim·ulp)
  * — use for throughput-bound scans where bit-exact oracle parity is not
  * required; keep [[VectorDistance]] for oracle-checked paths.
  */
case class SimdDistance(left: Expression, right: Expression, metric: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dist_simd"

  override def nullSafeEval(a: Any, b: Any): Any =
    SimdDistOps.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], metric)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SimdDistOps.dist($a, $b, $metric);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
