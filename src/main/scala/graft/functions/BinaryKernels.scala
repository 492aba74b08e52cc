package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 1-bit binary quantization kernels: pack a float vector into sign bits
  * relative to per-dimension thresholds (64 dims per long word — 32×
  * smaller than float32 storage), and pop-count Hamming distance between
  * packed signatures. The coarse tier of binary-sketch ANN
  * ([[graft.knn.Quantize.searchBinary]]): Hamming on packed words
  * approximates angular/L2 order around the thresholds, full-precision
  * rescore restores exact ranks on the survivors.
  *
  * Both are fused primitive loops (same rationale as [[Sq8Encode]]): the
  * higher-order-function formulation walks the array through boxed
  * lambdas; this is one pass over primitives per row.
  */
object BinaryKernels {

  /** JVM-side packer — the same bit layout as [[BinaryPack]], for
    * driver-side query packing and mapPartitions scans. Bit j of word w
    * is set iff v(64w+j) > thr(64w+j).
    */
  def pack(v: Array[Float], thr: Array[Float]): Array[Long] = {
    require(v.length == thr.length,
      s"vector dim ${v.length} != thresholds dim ${thr.length}")
    val words = new Array[Long]((v.length + 63) >> 6)
    var i = 0
    while (i < v.length) {
      if (v(i) > thr(i)) words(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    words
  }

  /** Pop-count Hamming distance between equal-length packed signatures. */
  def hamming(a: Array[Long], b: Array[Long]): Int = {
    var acc = 0
    var i = 0
    while (i < a.length) { acc += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    acc
  }
}

/** `binary_pack(vector, thresholds)` → `array<long>` signature. */
case class BinaryPack(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "binary_pack"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"binary_pack needs two array<float>/array<double>, got ${l.catalogString}, ${r.catalogString}")
  }

  @inline private def elem(arr: ArrayData, isFloat: Boolean, i: Int): Float =
    if (isFloat) arr.getFloat(i) else arr.getDouble(i).toFloat

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val t = b.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (t.numElements() != n)
      throw new IllegalArgumentException(
        s"binary_pack: vector dim $n != thresholds dim ${t.numElements()}")
    val vf = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val tf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val words = new Array[Long]((n + 63) >> 6)
    var i = 0
    while (i < n) {
      if (elem(v, vf, i) > elem(t, tf, i)) words(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(words)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `hamming_words(a, b)` → int pop-count distance over packed words. */
case class HammingWords(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "hamming_words"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"hamming_words needs two array<long>, got ${l.catalogString}, ${r.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"hamming_words: signature lengths differ ($n vs ${y.numElements()})")
    var acc = 0
    var i = 0
    while (i < n) { acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1 }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
