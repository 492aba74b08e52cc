package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distance metrics over `array<float>`/`array<double>` vector columns.
  *
  * Mirrors the semantics of the reference's distance spaces
  * (`/root/reference/index/space/space.go:40-73`,
  * `/root/reference/index/space/native_impl.go:9-40`):
  *  - euclidean  = sqrt(sum((a_i-b_i)^2))
  *  - manhattan  = sum(|a_i-b_i|)
  *  - cosine     = |1 - dot/(|a|*|b|)|   (abs per `space.go:73`)
  *
  * Accumulation is in double precision (elements are widened exactly), in
  * element order, so results are bit-reproducible across engines that do the
  * same left-to-right fold. Fully codegen'd: stays inside WholeStageCodegen
  * with primitive `ArrayData` reads — no boxing, no UDF serialization.
  */
object VectorDistance {
  final val Euclidean = 0
  final val Manhattan = 1
  final val Cosine = 2
}

abstract class VectorBinaryDoubleExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Read element i of an ArrayData as double (interpreted path). */
  protected def readElem(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case _ => throw new IllegalStateException(s"unsupported element type $et")
  }

  /** Java source reading element i of array variable `v` as double. */
  protected def readElemCode(v: String, i: String, et: DataType): String = et match {
    case FloatType => s"(double) $v.getFloat($i)"
    case DoubleType => s"$v.getDouble($i)"
    case _ => throw new IllegalStateException(s"unsupported element type $et")
  }
}

case class VectorDistance(left: Expression, right: Expression, metric: Int)
    extends VectorBinaryDoubleExpression {

  override def prettyName: String = metric match {
    case VectorDistance.Euclidean => "dist_euclidean"
    case VectorDistance.Manhattan => "dist_manhattan"
    case VectorDistance.Cosine => "dist_cosine"
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    val n = math.min(x.numElements(), y.numElements())
    metric match {
      case VectorDistance.Euclidean =>
        var acc = 0.0
        var i = 0
        while (i < n) {
          val d = readElem(x, i, lt) - readElem(y, i, rt)
          acc += d * d
          i += 1
        }
        math.sqrt(acc)
      case VectorDistance.Manhattan =>
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += math.abs(readElem(x, i, lt) - readElem(y, i, rt))
          i += 1
        }
        acc
      case VectorDistance.Cosine =>
        var dot = 0.0
        var na = 0.0
        var nb = 0.0
        var i = 0
        while (i < n) {
          val xv = readElem(x, i, lt)
          val yv = readElem(y, i, rt)
          dot += xv * yv
          na += xv * xv
          nb += yv * yv
          i += 1
        }
        math.abs(1.0 - dot / (math.sqrt(na) * math.sqrt(nb)))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lt = elemType(left)
      val rt = elemType(right)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val header = s"int $n = java.lang.Math.min($a.numElements(), $b.numElements());"
      metric match {
        case VectorDistance.Euclidean =>
          val acc = ctx.freshName("acc")
          val d = ctx.freshName("d")
          s"""
           |$header
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = (${readElemCode(a, i, lt)}) - (${readElemCode(b, i, rt)});
           |  $acc += $d * $d;
           |}
           |${ev.value} = java.lang.Math.sqrt($acc);
           """.stripMargin
        case VectorDistance.Manhattan =>
          val acc = ctx.freshName("acc")
          s"""
           |$header
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += java.lang.Math.abs((${readElemCode(a, i, lt)}) - (${readElemCode(b, i, rt)}));
           |}
           |${ev.value} = $acc;
           """.stripMargin
        case VectorDistance.Cosine =>
          val dot = ctx.freshName("dot")
          val na = ctx.freshName("na")
          val nb = ctx.freshName("nb")
          val xv = ctx.freshName("xv")
          val yv = ctx.freshName("yv")
          s"""
           |$header
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = ${readElemCode(a, i, lt)};
           |  double $yv = ${readElemCode(b, i, rt)};
           |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
           |}
           |${ev.value} = java.lang.Math.abs(1.0 - $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)));
           """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product (reference `math/vector.go:75-81`). */
case class VectorDot(left: Expression, right: Expression) extends VectorBinaryDoubleExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += readElem(x, i, lt) * readElem(y, i, rt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lt = elemType(left)
      val rt = elemType(right)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $acc += (${readElemCode(a, i, lt)}) * (${readElemCode(b, i, rt)});
       |}
       |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Vector L2 length (reference `math/vector.go:83-85`: sqrt(dot(a,a))). */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_norm"

  private def et: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val isFloat = et == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      val read = if (et == FloatType) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
       |int $n = $a.numElements();
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $v = $read;
       |  $acc += $v * $v;
       |}
       |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Serialize a float vector to big-endian float32 bytes
  * (reference `math/vector.go:25-37` `Vector.Save`).
  */
case class VecToBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_to_bytes"

  private def et: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val isFloat = et == FloatType
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      val f = if (isFloat) x.getFloat(i) else x.getDouble(i).toFloat
      val bits = java.lang.Float.floatToIntBits(f)
      out(i * 4) = (bits >>> 24).toByte
      out(i * 4 + 1) = (bits >>> 16).toByte
      out(i * 4 + 2) = (bits >>> 8).toByte
      out(i * 4 + 3) = bits.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val bits = ctx.freshName("bits")
      val read = if (et == FloatType) s"$a.getFloat($i)" else s"(float) $a.getDouble($i)"
      s"""
       |int $n = $a.numElements();
       |byte[] $out = new byte[$n * 4];
       |for (int $i = 0; $i < $n; $i++) {
       |  int $bits = java.lang.Float.floatToIntBits($read);
       |  $out[$i * 4] = (byte) ($bits >>> 24);
       |  $out[$i * 4 + 1] = (byte) ($bits >>> 16);
       |  $out[$i * 4 + 2] = (byte) ($bits >>> 8);
       |  $out[$i * 4 + 3] = (byte) $bits;
       |}
       |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deserialize big-endian float32 bytes to `array<float>`
  * (reference `math/vector.go:39-47` `Vector.Load`).
  */
case class VecFromBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_from_bytes"

  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    val n = bytes.length / 4
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val bits = ((bytes(i * 4) & 0xff) << 24) | ((bytes(i * 4 + 1) & 0xff) << 16) |
        ((bytes(i * 4 + 2) & 0xff) << 8) | (bytes(i * 4 + 3) & 0xff)
      out(i) = java.lang.Float.intBitsToFloat(bits)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val bits = ctx.freshName("bits")
      s"""
       |int $n = $a.length / 4;
       |float[] $out = new float[$n];
       |for (int $i = 0; $i < $n; $i++) {
       |  int $bits = (($a[$i * 4] & 0xff) << 24) | (($a[$i * 4 + 1] & 0xff) << 16) |
       |    (($a[$i * 4 + 2] & 0xff) << 8) | ($a[$i * 4 + 3] & 0xff);
       |  $out[$i] = java.lang.Float.intBitsToFloat($bits);
       |}
       |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling hash (Karp-Rabin style) over a string's UTF-8 bytes:
  * h = h * 1000003 + byte, with 64-bit wraparound. Used as a cheap document
  * fingerprint (brief: "document fingerprinting (rolling hash)").
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val bytes = ctx.freshName("bytes")
      s"""
       |byte[] $bytes = $a.getBytes();
       |long $h = 0L;
       |for (int $i = 0; $i < $bytes.length; $i++) {
       |  $h = $h * 1000003L + ($bytes[$i] & 0xffL);
       |}
       |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
