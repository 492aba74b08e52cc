package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels invoked from generated code — the expressions below emit a
  * single static call, so whole-stage codegen stays intact while the loops
  * run as plain JVM code.
  */
object SetSimilarityKernel {

  /** xxh64-style avalanche of a long (splitmix64 finalizer). */
  @inline def mix(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Intersection size of two ascending-sorted long arrays (merge walk). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { cnt += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    cnt
  }

  /** One-pass MinHash banding: hash each shingle once (Murmur3 of its UTF-8
    * bytes), derive `numHashes` seeded variants by mixing, track per-seed
    * minima, then collapse each band of `rowsPerBand` minima into one hash.
    * Returns the band-hash array. Replaces numHashes full string-hash passes
    * (the naive HOF formulation) with one.
    */
  def minhashBandHashes(shingles: ArrayData, bands: Int, rowsPerBand: Int): UnsafeArrayData = {
    val numHashes = bands * rowsPerBand
    val minima = new Array[Long](numHashes)
    java.util.Arrays.fill(minima, Long.MaxValue)
    val n = shingles.numElements()
    var s = 0
    while (s < n) {
      val str = shingles.getUTF8String(s)
      val base = Murmur3_x86_32.hashUnsafeBytes2(
        str.getBaseObject, str.getBaseOffset, str.numBytes, 42).toLong
      val full = mix(base ^ (str.numBytes.toLong << 32))
      var h = 0
      while (h < numHashes) {
        val v = mix(full ^ (h.toLong * 0x9e3779b97f4a7c15L))
        if (v < minima(h)) minima(h) = v
        h += 1
      }
      s += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var r = 0
      while (r < rowsPerBand) {
        acc = mix(acc ^ minima(b * rowsPerBand + r))
        r += 1
      }
      out(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Hash each string element once (same hash family as
    * [[minhashBandHashes]]), distinct, ascending sort — the per-row
    * precompute for [[SortedIntersectCount]] verify joins.
    */
  def hashedShingleSet(shingles: ArrayData): UnsafeArrayData = {
    val n = shingles.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val str = shingles.getUTF8String(i)
      val base = Murmur3_x86_32.hashUnsafeBytes2(
        str.getBaseObject, str.getBaseOffset, str.numBytes, 42).toLong
      hs(i) = mix(base ^ (str.numBytes.toLong << 32))
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < n) {
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, w))
  }
}

/** |A ∩ B| for ascending-sorted `array<long>` columns. O(|A|+|B|) merge. */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SetSimilarityKernel.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetSimilarityKernel.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaccard |A∩B| / |A∪B| of two ascending-sorted `array<long>` sets in one
  * merge pass (the two-expression icnt/(na+nb-icnt) formulation gets its
  * intersect duplicated by CollapseProject — this fuses it).
  */
case class JaccardFromSortedSets(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaccard_sorted_sets"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val icnt = SetSimilarityKernel.sortedIntersectCount(x, y)
    val union = x.numElements().toLong + y.numElements().toLong - icnt
    if (union == 0) 0.0 else icnt.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val icnt = ctx.freshName("icnt")
      val union = ctx.freshName("union")
      s"""
       |long $icnt = graft.functions.SetSimilarityKernel.sortedIntersectCount($a, $b);
       |long $union = (long) $a.numElements() + (long) $b.numElements() - $icnt;
       |${ev.value} = $union == 0L ? 0.0 : (double) $icnt / (double) $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash band hashes of an `array<string>` shingle set in one pass. */
case class MinHashBandHashes(child: Expression, bands: Int, rowsPerBand: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_band_hashes"

  override def nullSafeEval(a: Any): Any =
    SetSimilarityKernel.minhashBandHashes(a.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SetSimilarityKernel.minhashBandHashes($a, $bands, $rowsPerBand);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct sorted hash set of an `array<string>` column. */
case class HashedShingleSet(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hashed_shingle_set"

  override def nullSafeEval(a: Any): Any =
    SetSimilarityKernel.hashedShingleSet(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SetSimilarityKernel.hashedShingleSet($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
