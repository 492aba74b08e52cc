package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused SQ8 encoder: one primitive-loop pass over the vector producing
  * `struct(codes array<tinyint>, q_scale float, q_offset float,
  * q_err double, q_err_l1 double)` — the whole per-vector encode stage of
  * [[graft.knn.Quantize.sq8]] in a single expression.
  *
  * The composed higher-order-function formulation (array_min + array_max +
  * transform(codes) + two zip_with/aggregate error passes, plus a
  * normalize transform on the cosine path) walks the array ~8 times
  * through boxed lambda evaluation; since the exact two-pass τ search
  * re-derives the encode on BOTH scans, that cost is paid twice per
  * query batch. This kernel is the same arithmetic — bit-for-bit,
  * including Spark's BigDecimal HALF_UP `round` on float and the
  * float-then-double cast chain of the error columns (asserted by
  * Sq8Spec against the HOF formulation) — in one pass.
  *
  * With `normalize = true` the input is L2-normalized (in the same
  * float-divide-by-double-norm arithmetic as the column formulation)
  * before encoding, fusing [[graft.knn.Quantize.searchExactCosine]]'s
  * normalize-then-encode front end; a zero-norm vector returns NULL
  * (direction undefined) for the caller to filter, mirroring the
  * `norm > 0` corpus exclusion.
  *
  * Reference for the quantization scheme: `storage/compression.go`
  * (byte-range affine quantizer); the τ error columns are this repo's
  * exactness extension.
  */
case class Sq8Encode(child: Expression, normalize: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "sq8_encode"
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = Sq8Encode.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_encode needs array<float>/array<double>, got ${other.catalogString}")
    }

  /** Spark's `round(f, 0)` on FloatType: BigDecimal HALF_UP, NaN/Inf pass. */
  @inline private def roundF(f: Float): Float =
    if (f.isNaN || f.isInfinite) f
    else BigDecimal.decimal(f).setScale(0, BigDecimal.RoundingMode.HALF_UP).toFloat

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isFloat = elemIsFloat
    val v = new Array[Float](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) arr.getFloat(i) else arr.getDouble(i).toFloat
      i += 1
    }

    if (normalize) {
      var acc = 0.0
      i = 0
      while (i < n) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
      val norm = math.sqrt(acc)
      if (!(norm > 0)) return null
      i = 0
      while (i < n) { v(i) = (v(i).toDouble / norm).toFloat; i += 1 }
    }

    var mn = Float.PositiveInfinity
    var mx = Float.NegativeInfinity
    i = 0
    while (i < n) {
      val x = v(i)
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    val scale = (mx - mn) / 255f

    val codes = new Array[Byte](n)
    var errAcc = 0.0
    var errL1Acc = 0.0
    i = 0
    while (i < n) {
      val code = if (scale == 0f) 0 else roundF((v(i) - mn) / scale).toInt
      codes(i) = (code - 128).toByte
      // reconstruction in the HOF formulation's exact cast chain:
      // (float)((code) * scale) + offset as float, THEN widen to double
      val xhat = ((code.toFloat * scale) + mn).toDouble
      val d = v(i).toDouble - xhat
      errAcc += d * d
      errL1Acc += math.abs(d)
      i += 1
    }

    val row = new Array[Any](5)
    row(0) = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
    row(1) = scale
    row(2) = mn
    row(3) = math.sqrt(errAcc) * (1.0 + 1e-9) + 1e-12
    row(4) = errL1Acc * (1.0 + 1e-9) + 1e-12
    InternalRow.fromSeq(row.toIndexedSeq)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sq8Encode {
  val schema: StructType = StructType(Seq(
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("q_scale", FloatType, nullable = false),
    StructField("q_offset", FloatType, nullable = false),
    StructField("q_err", DoubleType, nullable = false),
    StructField("q_err_l1", DoubleType, nullable = false)))
}
