package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused SQ4 (4-bit) scalar-quantization encoder: one primitive-loop pass
  * over the vector producing `struct(codes array<tinyint>, q_scale float,
  * q_offset float, q_err double, q_err_l1 double, q_dim int)` — the 2×
  * compression step between the SQ8 byte tier ([[Sq8Encode]]) and the
  * 1-bit binary tier ([[BinaryPack]]).
  *
  * Same affine scheme as SQ8 with 16 levels instead of 256:
  * `code_i = round((v_i − min) / scale)` with `scale = (max − min)/15`,
  * reconstruction `v̂_i = code_i·scale + min`. TWO codes pack per byte
  * (low nibble = even dim, high nibble = odd dim), so a dim-64 float32
  * vector stores in 32 bytes — `q_dim` records the true dimension since
  * an odd-dim vector leaves the final high nibble as padding.
  *
  * The τ-exactness proof of [[graft.knn.Quantize.searchExact]] carries
  * UNCHANGED: it only needs the per-vector reconstruction errors
  * ‖v−v̂‖₂ / ‖v−v̂‖₁, which this kernel computes exactly like SQ8's (the
  * per-dimension max error doubles⁴ᵇⁱᵗˢ-wise — scale/2 per dim is 16×
  * SQ8's — so τ filters pass more candidates; the bound formula, and
  * hence exactness, is identical). Float arithmetic matches [[Sq8Encode]]
  * convention for convention: BigDecimal HALF_UP rounding, the
  * float-then-double reconstruction cast chain, and the same 1e-9/1e-12
  * error inflation absorbing double rounding.
  *
  * Reference for the quantization scheme: `storage/compression.go`
  * (byte-range affine quantizer, here at nibble range); the τ error
  * columns are this repo's exactness extension.
  */
case class Sq4Encode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "sq4_encode"
  override def nullable: Boolean = child.nullable

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = Sq4Encode.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq4_encode needs array<float>/array<double>, got ${other.catalogString}")
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

    var mn = Float.PositiveInfinity
    var mx = Float.NegativeInfinity
    i = 0
    while (i < n) {
      val x = v(i)
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    val scale = (mx - mn) / 15f

    val packed = new Array[Byte]((n + 1) / 2)
    var errAcc = 0.0
    var errL1Acc = 0.0
    i = 0
    while (i < n) {
      val code = if (scale == 0f) 0 else roundF((v(i) - mn) / scale).toInt
      // low nibble = even dim, high nibble = odd dim
      if ((i & 1) == 0) packed(i >> 1) = code.toByte
      else packed(i >> 1) = (packed(i >> 1) | (code << 4)).toByte
      // reconstruction in SQ8's exact cast chain: (float)(code * scale) +
      // offset as float, THEN widen to double
      val xhat = ((code.toFloat * scale) + mn).toDouble
      val d = v(i).toDouble - xhat
      errAcc += d * d
      errL1Acc += math.abs(d)
      i += 1
    }

    val row = new Array[Any](6)
    row(0) = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(packed)
    row(1) = scale
    row(2) = mn
    row(3) = math.sqrt(errAcc) * (1.0 + 1e-9) + 1e-12
    row(4) = errL1Acc * (1.0 + 1e-9) + 1e-12
    row(5) = n
    InternalRow.fromSeq(row.toIndexedSeq)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sq4Encode {
  val schema: StructType = StructType(Seq(
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("q_scale", FloatType, nullable = false),
    StructField("q_offset", FloatType, nullable = false),
    StructField("q_err", DoubleType, nullable = false),
    StructField("q_err_l1", DoubleType, nullable = false),
    StructField("q_dim", IntegerType, nullable = false)))

  /** Unpack + dequantize packed nibble codes (the executor-side scalar
    * twin of the encode loop's reconstruction arithmetic).
    */
  def dequantize(packed: Array[Byte], dim: Int, scale: Float, offset: Float): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val u = packed(i >> 1).toInt & 0xff
      val code = if ((i & 1) == 0) u & 0xf else u >>> 4
      out(i) = code.toFloat * scale + offset
      i += 1
    }
    out
  }
}
